#!/bin/bash
# Round-close checklist (VERDICT r8-r10 repeatedly flagged a dirty
# snapshot): stage the judged artifacts and every tracked modification,
# then show what would ship. Run BEFORE the turn budget ends; the driver
# snapshots whatever state it finds.
#
# NOT staged on purpose: PROGRESS.jsonl and COPYCHECK.json are
# .gitignore'd driver-owned logs (git add would refuse without -f; they
# are regenerated every round and were never part of the judged tree).
# The r{N} correctness/bench files for the CURRENT round are written by
# the driver AFTER the snapshot — they can only ever be committed by the
# NEXT round's session (so each round must stage the previous round's).
set -e
cd "$(dirname "$0")/.."
# r14 shipped a red BenchSpec because the close checklist never re-ran
# the suite after the last sidecar write (r14 verdict #1) — the FULL
# suite is now part of the close, and it must be green to proceed.
echo "--- full test suite (must be green to close): ---"
sbt -batch test
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json \
         bench_probe*.json BENCH_sf1.json; do
  [ -e "$f" ] && git add -- "$f"
done
git add -u   # every tracked modification, wherever it lives
echo "--- remaining unstaged/untracked (must be empty before snapshot): ---"
git status --short
