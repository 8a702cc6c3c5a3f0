"""geodesk_gol_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of clarisma/geodesk-gol
(reference at /root/reference, studied for behavior only): tile-pyramid
build, spatial partitioning, spatial joins, GOQL-style querying,
multi-format export and incremental update — as idiomatic Spark
DataFrame programs (broadcast + shuffle joins, partial/final aggregation,
partition pruning) instead of the reference's single-node mmap engine.

Package layout (SURVEY.md §2 operator ids in parens):

- ``sources``   — interleaved-document synthesis + span parser (S1-S3)
- ``functions`` — projection / tile math / Hilbert / area rules (F1-F8)
- ``plans``     — tile-pyramid builder & tile catalog (A1, A4, A5)
- ``operators`` — tile-assignment joins, validator, compiler (J1-J8, A6-A9, O1-O4)
- ``query``     — GOQL translator, bbox/polygon filters, output formats (P1-P5, S7, F9)
- ``ops``       — training-data operators: dedup, text, ANN, media
- ``streaming`` — change-feed merge + windowed aggregation (S8, J10)
- ``oracle``    — independent slow-path pure-Python implementation for tests
"""

__version__ = "0.1.0"
