#!/usr/bin/env python3
"""Merge N bench_probe-style sidecars into one whose per-key entry is the
pass with the MEDIAN wallS for that key (the whole probe row rides along,
so cpu/shuffle/spill columns stay mutually consistent). Purpose (r14
verdict item #2): a single full pass has a heavy right tail on some keys
(host-level contention — see PLANS.md round-12 variance log), and r13
committed the worst of three passes as the round's evidence; per-key
medians of three same-day passes are the honest committed number. The
method is disclosed in SURVEY §6.

Usage: python3 tools/median_probe.py out.json in1.json in2.json [in3.json ...]
Keys missing from some passes keep the median over the passes that have
them. The 'sf' field must agree across inputs.
"""
import sys, json

out, ins = sys.argv[1], sys.argv[2:]
docs = [json.load(open(p)) for p in ins]
sfs = {d["sf"] for d in docs}
assert len(sfs) == 1, f"mixed sf dirs: {sfs}"
# The JVM envelope (r15: driverMemMB/cores ride every sidecar) must agree
# across passes — medians of mixed-heap passes would be meaningless.
env = {}
for f in ("driverMemMB", "cores"):
    vals = {d[f] for d in docs if f in d}
    assert len(vals) <= 1, f"mixed {f} across passes: {vals}"
    if vals:
        env[f] = vals.pop()
keys = []
for d in docs:
    for k in d["probe"]:
        if k not in keys:
            keys.append(k)
merged = {}
for k in keys:
    rows = [d["probe"][k] for d in docs if k in d["probe"]]
    rows.sort(key=lambda r: r["wallS"])
    merged[k] = rows[(len(rows) - 1) // 2]  # lower median: a real pass's row
# Compact separators: BenchSpec's probe-coverage gate matches "key":{"wallS"
# (no spaces) — Python's default ", "/": " separators broke the r14 gate.
json.dump({"probe": merged, **env, "sf": sfs.pop()}, open(out, "w"),
          separators=(",", ":"))
print(f"{out}: {len(merged)} keys from {len(ins)} passes; "
      f"totals per pass: {[round(sum(r['wallS'] for r in d['probe'].values()), 2) for d in docs]}; "
      f"merged total: {round(sum(r['wallS'] for r in merged.values()), 2)}")
