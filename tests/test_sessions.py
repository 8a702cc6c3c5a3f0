"""Sessionization: streaming stateful operator == batch SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from geodesk_gol_spark.streaming.sessions import (
    run_sessions_to_memory,
    sessionize_batch,
    sessionize_stream,
)

from .conftest import SF_DIR

GAP = 1_800_000_000


def _latest_per_session(df):
    """Upsert semantics: keep the last emission per (user, session)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "session_seq").orderBy(
        F.desc("n_events"), F.desc("end_us")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )


def _rows(df):
    return {
        (r.user_id, r.session_seq, r.n_events, r.start_us, r.end_us)
        for r in df.collect()
    }


def test_stream_single_batch_equals_batch(spark, tmp_path):
    import shutil

    src = tmp_path / "ev1"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = run_sessions_to_memory(sessionize_stream(stream, GAP), "sess_one")
    q.awaitTermination()
    got = _rows(_latest_per_session(spark.sql("SELECT * FROM sess_one")))
    want = _rows(sessionize_batch(events, GAP))
    assert got == want


def test_stream_two_batches_continue_sessions(spark, tmp_path):
    """Sessions spanning the batch boundary are continued from state and
    re-emitted with their final extent (latest-wins upsert)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cut = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "ev2"
    src.mkdir()
    # time-ordered split: file 0 = first half, file 1 = rest
    events.filter(F.col("event_id") <= cut).coalesce(1).write.parquet(
        str(src / "f0")
    )
    events.filter(F.col("event_id") > cut).coalesce(1).write.parquet(
        str(src / "f1")
    )
    import glob
    import shutil

    for i, d in enumerate(["f0", "f1"]):
        [p] = glob.glob(str(src / d / "*.parquet"))
        shutil.move(p, src / f"batch-{i}.parquet")
        shutil.rmtree(src / d)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_sessions_to_memory(sessionize_stream(stream, GAP), "sess_two")
    q.awaitTermination()
    out = spark.sql("SELECT * FROM sess_two")
    # more than one micro-batch actually ran: some session must have
    # been emitted twice (snapshot then final)
    n_emit = out.count()
    got = _latest_per_session(out)
    assert n_emit > got.count()
    assert _rows(got) == _rows(sessionize_batch(events, GAP))


def test_fold_sessions_late_events_no_state_corruption():
    """Cross-batch late events must not regress the open session's
    ``last`` (which would corrupt every later gap comparison): a late
    event within gap reach joins the session (extending start
    backwards); one behind the watermark is dropped."""
    import pandas as pd

    from geodesk_gol_spark.streaming.sessions import _fold_sessions

    gap = 1_800_000_000
    # batch 1: t=100 closes into its own session once t=5e9 opens a new one
    out1, seq, n, start, last = _fold_sessions(
        pd.DataFrame({"t": [100, 5_000_000_000]}), 0, 0, 0, 0, gap)
    assert (seq, n, start, last) == (2, 1, 5_000_000_000, 5_000_000_000)
    # batch 2: t=200 is behind the open session's watermark -> dropped,
    # state unchanged (the old code made last=200 and start>end)
    out2, seq, n, start, last = _fold_sessions(
        pd.DataFrame({"t": [200]}), seq, n, start, last, gap)
    assert (seq, n, start, last) == (2, 1, 5_000_000_000, 5_000_000_000)
    assert out2 == [(2, 1, 5_000_000_000, 5_000_000_000)]
    # batch 3: mildly late event within gap reach joins, start extends
    out3, seq, n, start, last = _fold_sessions(
        pd.DataFrame({"t": [4_000_000_000]}), seq, n, start, last, gap)
    assert (seq, n, start, last) == (2, 2, 4_000_000_000, 5_000_000_000)
    assert out3 == [(2, 2, 4_000_000_000, 5_000_000_000)]
