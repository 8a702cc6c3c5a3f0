#!/bin/bash
# Fleet-fair process-scaling measurement (the closest single-host
# analogue of "N vs 4N executors"): each executor is its own pinned
# 1-core JVM with its own heap/GC/scheduler, a FULL build per process,
# x2 pre-materialized input, aggregate work = 4x the baseline.
# Methodology: BENCH_SCALING.md (2026-08-17 / 2026-08-18 entries).
# Usage: tools/fleet_scaling.sh [n_solo_tries]
set -u
cd /root/repo
DOCS=/dev/shm/gol_shard_docs
TRIES=${1:-3}

if [ ! -f "$DOCS/_SUCCESS" ]; then
  python - <<PY
import sys; sys.path.insert(0, "/root/repo")
from bench import materialize_docs
materialize_docs("/root/testdata/sf0.1", 2, "$DOCS")
PY
fi

steal() { awk '$1=="cpu"{print $9}' /proc/stat; }
tot()   { awk '$1=="cpu"{s=0;for(i=2;i<=11;i++)s+=$i;print s}' /proc/stat; }

run_one() {  # core, outfile
  taskset -c "$1" env SPARK_GRAFT_DRIVER_MEM=3g \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_HI=8 \
    SPARK_GRAFT_TMP="/dev/shm/gol_fleet_$1" \
    python bench.py --one 1 2 "$DOCS" 2>/dev/null | grep '^RESULT ' > "$2"
}

echo "== solo baseline (1 pinned proc, $TRIES tries) =="
for t in $(seq 1 "$TRIES"); do
  s0=$(steal); t0=$(tot)
  run_one 0 "/tmp/fleet_base_$t.json"
  s1=$(steal); t1=$(tot)
  python3 - "$t" "$s0" "$t0" "$s1" "$t1" <<'PY'
import json, sys
t, s0, t0, s1, t1 = sys.argv[1:6]
st = 100.0 * (int(s1) - int(s0)) / max(int(t1) - int(t0), 1)
d = json.loads(open(f"/tmp/fleet_base_{t}.json").read()[7:])
print(f"solo try {t}: engine {d['engine_sec']}s = {d['features_per_sec']} f/s @ host steal {st:.1f}%")
PY
  sleep 15
done

echo "== fleet: 4 concurrent pinned 1-core procs =="
s0=$(steal); t0=$(tot)
for i in 0 1 2 3; do run_one "$i" "/tmp/fleet_proc_$i.json" & done
wait
s1=$(steal); t1=$(tot)
python3 - "$s0" "$t0" "$s1" "$t1" <<'PY'
import json, sys
s0, t0, s1, t1 = sys.argv[1:5]
st = 100.0 * (int(s1) - int(s0)) / max(int(t1) - int(t0), 1)
tot = 0.0
for i in range(4):
    d = json.loads(open(f"/tmp/fleet_proc_{i}.json").read()[7:])
    print(f"fleet proc {i}: engine {d['engine_sec']}s = {d['features_per_sec']} f/s")
    tot += d["features_per_sec"]
print(f"fleet aggregate: {tot:.0f} f/s @ host steal {st:.1f}%")
PY
