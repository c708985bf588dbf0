#!/usr/bin/env python3
"""Stage-level attribution from a Spark event log (zstd rolling dir).

Usage: stage_attr.py /tmp/evlog/eventlog_v2_local-*/ [minShufMB]

Prints per-stage shuffle write/read, spill, records and the first line of
the stage's callsite, sorted by shuffle write — the tool that found the
r18 containment spill source in one run, promoted from a shell one-liner.
"""
import sys, json, glob, subprocess, os

def events(d):
    for f in sorted(glob.glob(os.path.join(d, "events_*"))):
        if f.endswith(".zstd"):
            out = subprocess.run(["zstd", "-d", "-c", f],
                                 capture_output=True).stdout
        else:
            out = open(f, "rb").read()
        for line in out.splitlines():
            if line.strip():
                yield json.loads(line)

def main():
    d = sys.argv[1]
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    rows = []
    for e in events(d):
        if e.get("Event") != "SparkListenerStageCompleted":
            continue
        si = e["Stage Info"]
        acc = {a["Name"]: a.get("Value", 0) for a in si.get("Accumulables", [])}
        def g(name):
            v = acc.get(name, 0)
            try:
                return int(v)
            except (TypeError, ValueError):
                return 0
        rows.append({
            "stage": si["Stage ID"],
            "attempt": si["Stage Attempt ID"],
            "tasks": si["Number of Tasks"],
            "name": si["Stage Name"].split("\n")[0][:70],
            "swMB": g("internal.metrics.shuffle.write.bytesWritten") / 1e6,
            "swRec": g("internal.metrics.shuffle.write.recordsWritten"),
            "srMB": (g("internal.metrics.shuffle.read.localBytesRead")
                     + g("internal.metrics.shuffle.read.remoteBytesRead")) / 1e6,
            "srRec": g("internal.metrics.shuffle.read.recordsRead"),
            "spillMB": g("internal.metrics.diskBytesSpilled") / 1e6,
            "memSpillMB": g("internal.metrics.memoryBytesSpilled") / 1e6,
            "cpuS": g("internal.metrics.executorCpuTime") / 1e9,
            "runS": g("internal.metrics.executorRunTime") / 1e3,
        })
    # r20 (ADVICE): retried stages emit one StageCompleted per ATTEMPT —
    # summing every row double-counts a retried stage's shuffle/spill in
    # the headline totals. Totals keep only the last attempt per Stage ID;
    # earlier attempts stay in the table, flagged with a trailing '*'.
    last = {}
    for r in rows:
        if r["stage"] not in last or r["attempt"] > last[r["stage"]]["attempt"]:
            last[r["stage"]] = r
    rows.sort(key=lambda r: -r["swMB"])
    tot_w = sum(r["swMB"] for r in last.values())
    tot_sp = sum(r["spillMB"] for r in last.values())
    retried = sum(1 for r in rows if last[r["stage"]] is not r)
    print(f"total shuffle write {tot_w:10.0f} MB   disk spill {tot_sp:8.0f} MB"
          + (f"   ({retried} superseded attempt(s) excluded, marked *)"
             if retried else ""))
    print(f"{'stage':>5} {'tasks':>5} {'swMB':>8} {'swRec':>12} {'srMB':>8} "
          f"{'srRec':>12} {'spill':>7} {'cpuS':>7} {'runS':>7}  name")
    for r in rows:
        r["name"] += "" if last[r["stage"]] is r else " *"
        if r["swMB"] < min_mb and r["srMB"] < min_mb and r["spillMB"] < min_mb:
            continue
        print(f"{r['stage']:>5} {r['tasks']:>5} {r['swMB']:>8.0f} "
              f"{r['swRec']:>12} {r['srMB']:>8.0f} {r['srRec']:>12} "
              f"{r['spillMB']:>7.0f} {r['cpuS']:>7.0f} {r['runS']:>7.0f}  {r['name']}")

if __name__ == "__main__":
    main()
