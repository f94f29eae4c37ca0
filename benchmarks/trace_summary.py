"""Summarise a jax.profiler trace into an op-level sink table (VERDICT r3
item 5: timeline evidence for the perf backlog, not just ablations).

Reads the newest ``*.trace.json.gz`` under the trace dir that
benchmarks/profile_step.py wrote, aggregates complete events by name within
each process/lane, and prints the top sinks with total/self durations. The
output (committed as benchmarks/TRACE_SUMMARY.md) is the repo's record of
where a real flagship step spends its time.

Usage: python benchmarks/trace_summary.py [trace_dir] [--top 40]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def newest_trace(root: str) -> str:
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return max(paths, key=os.path.getmtime)


def summarise(path: str, top: int = 40):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # process/thread names give the lanes (TPU device vs host threads)
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    lanes = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    lane_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = e.get("pid")
        lane = pnames.get(pid, str(pid))
        tname = tnames.get((pid, e.get("tid")), "")
        if tname:
            lane = f"{lane}/{tname}"
        name = e.get("name", "?")
        rec = lanes[lane][name]
        rec[0] += e["dur"] / 1e3  # us -> ms
        rec[1] += 1
        lane_total[lane] += e["dur"] / 1e3
    out = []
    for lane in sorted(lanes, key=lambda k: -lane_total[lane]):
        ops = lanes[lane]
        total = lane_total[lane]
        out.append(f"\n## lane: {lane}  (sum of event durations {total:.1f} ms)")
        out.append("| op | total ms | calls | % of lane |")
        out.append("|---|---|---|---|")
        for name, (dur, n) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
            out.append(f"| {name[:90]} | {dur:.2f} | {n} | {100*dur/total:.1f} |")
        if "XLA Ops" in lane:
            # group by op family (name minus trailing .<id>s): the per-id
            # rows hide aggregate sinks like the scan carry copies
            fams = defaultdict(lambda: [0.0, 0])
            for name, (dur, n) in ops.items():
                fam = re.sub(r"[.\d]+$", "", name)
                fams[fam][0] += dur
                fams[fam][1] += n
            out.append(f"\n### {lane}: by op family")
            out.append("| family | total ms | calls | % of lane |")
            out.append("|---|---|---|---|")
            for fam, (dur, n) in sorted(
                fams.items(), key=lambda kv: -kv[1][0]
            )[:top]:
                out.append(
                    f"| {fam[:90]} | {dur:.2f} | {n} | {100*dur/total:.1f} |"
                )
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/bevbert_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    path = newest_trace(args.trace_dir)
    print(f"# Trace summary: {os.path.basename(path)}")
    print(summarise(path, args.top))


if __name__ == "__main__":
    main()
