#!/bin/bash
# one pinned scaling try with steal bookends; args: <n_cores> <rep> <docs_path>
N=$1; REP=$2; DOCS=$3
read_ticks() {
  awk -v n="$N" '$1 ~ /^cpu[0-9]+$/ { c=substr($1,4)+0; if (c<n) { st+=$9; for(i=2;i<=11;i++) tot+=$i } } END { print st, tot }' /proc/stat
}
read ST0 TOT0 <<< "$(read_ticks)"
OUT=$(taskset -c 0-$((N-1)) env \
  SPARK_GRAFT_DRIVER_MEM=$((3*N))g \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SCALE_HI=8 \
  python /root/repo/bench.py --one "$N" "$REP" "$DOCS" 2>/dev/null | grep '^RESULT ')
read ST1 TOT1 <<< "$(read_ticks)"
STEAL=$(python3 -c "print(round(100.0*($ST1-$ST0)/max($TOT1-$TOT0,1),2))")
echo "STEAL_PCT $STEAL"
echo "$OUT"
