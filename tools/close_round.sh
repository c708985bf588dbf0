#!/bin/bash
# Round-close checklist (VERDICT r8-r10 repeatedly flagged a dirty
# snapshot): stage every per-round judged artifact plus any stray tracked
# modifications, then show what would ship. Run BEFORE the turn budget
# ends; the driver snapshots whatever state it finds.
#
# The r{N} correctness/bench files for the CURRENT round are written by
# the driver AFTER the snapshot — they can only ever be committed by the
# NEXT round's session (so each round must stage the previous round's).
set -e
cd "$(dirname "$0")/.."
git add -A BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
  bench_probe*.json BENCH_sf1.json PROGRESS.jsonl 2>/dev/null || true
echo "--- staged/unstaged state (must be empty before snapshot): ---"
git status --short
