#!/bin/bash
# Round-20 battery: 3 instrumented passes per scale on the CURRENT code
# plus ONE paired control pass per scale at the r19 tag (worktree at
# /tmp/graft-r19ctl, commit 4df8fc1 — the round-19 final code) — the
# same-host/same-heap tenancy instrument standard since r17. Envelopes
# mirror the committed r18 sidecars: sf0.1 at 89g, sf1/sf5 at 8g, sf10
# at 12g.
# pipefail (r17 ADVICE): without it a crashed bench pass exits 0 through
# `| tail -1` and the battery silently proceeds on a stale probe JSON.
# The median is aggregated BEFORE the control leg (r18 ADVICE): a failed
# control pass must not discard three already-successful current-code
# passes.
# NOTE (r19 lesson): delete stale /tmp/probe_* from any previous round
# BEFORE the first scale — the filenames repeat round to round and a
# crashed pass could silently median a stale file.
# Usage: tools/run_battery_r20.sh <scale>   (scale in: sf0.1 sf1 sf5 sf10)
set -eo pipefail
cd "$(dirname "$0")/.."
SCALE="$1"
case "$SCALE" in
  sf0.1) DIR=/root/testdata/sf0.1; MEM=89g ;;
  sf1)   DIR=/root/repo/data/sf1;  MEM=8g ;;
  sf5)   DIR=/root/repo/data/sf5;  MEM=8g ;;
  sf10)  DIR=/root/repo/data/sf10; MEM=12g ;;
  *) echo "unknown scale $SCALE"; exit 2 ;;
esac
OUTTAG=$(echo "$SCALE" | tr -d .)
for P in 1 2 3; do
  echo "=== $SCALE pass $P ($(date -u +%H:%M:%S)) ==="
  SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_SF_DIR=$DIR \
    SPARK_GRAFT_PROBE_OUT=/tmp/probe_${OUTTAG}_p${P}.json \
    sbt -batch "runMain graft.Bench" 2>/tmp/bench_${OUTTAG}_p${P}.err | tail -1
done
python3 tools/median_probe.py /tmp/probe_${OUTTAG}_median.json \
  /tmp/probe_${OUTTAG}_p1.json /tmp/probe_${OUTTAG}_p2.json /tmp/probe_${OUTTAG}_p3.json
echo "=== $SCALE r19-code control pass ($(date -u +%H:%M:%S)) ==="
(cd /tmp/graft-r19ctl && SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_SF_DIR=$DIR \
  SPARK_GRAFT_PROBE_OUT=/tmp/probe_${OUTTAG}_r19ctl.json \
  sbt -batch "runMain graft.Bench" 2>/tmp/bench_${OUTTAG}_r19ctl.err | tail -1)
echo "=== $SCALE done ($(date -u +%H:%M:%S)) ==="
