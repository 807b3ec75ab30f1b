"""Rank XLA ops from a jax.profiler perfetto trace (VERDICT r2 next #3:
name the top sinks in the non-DAMSM part of the train step).

Reads the perfetto_trace.json.gz that scripts/capture_trace.py writes
(jax.profiler.trace(..., create_perfetto_trace=True)) and prints the
top-K trace slices by total duration, grouped by op name with the
framework-assigned fusion suffixes stripped (loop_convolution_fusion.123
-> loop_convolution_fusion).  Absolute times through the axon tunnel are
unreliable (CLAUDE.md); the RELATIVE shares are the signal.

Usage: python scripts/summarize_trace.py /tmp/sba_trace_lam0 [topk]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(root):
    hits = sorted(
        glob.glob(os.path.join(root, "**", "*perfetto*"), recursive=True)
        + glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                    recursive=True)
    )
    if not hits:
        raise SystemExit(f"no perfetto/trace json under {root}")
    return hits[-1]


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"] if isinstance(data, dict) else data


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sba_trace_lam0"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    path = find_trace(root)
    events = load_events(path)

    # thread/process names, to label device vs host lanes
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("thread_name",
                                                    "process_name"):
            key = (e.get("pid"), e.get("tid")) if e["name"] == "thread_name" \
                else (e.get("pid"), None)
            names[key] = e.get("args", {}).get("name", "")

    by_op = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = names.get((e.get("pid"), e.get("tid")), "") or \
            names.get((e.get("pid"), None), "")
        # keep device compute lanes; drop host python/runtime threads
        if lane and not re.search(r"XLA|TPU|device|Stream|/|:", lane):
            continue
        op = re.sub(r"[.\d]+$", "", e.get("name", "?"))
        by_op[op] += e["dur"]
        calls[op] += 1
        total += e["dur"]

    print(f"trace: {path}")
    print(f"lanes kept: device-like; total slice time {total / 1e3:.1f} ms")
    print("| op | total ms | % | calls |")
    print("|---|---|---|---|")
    for op, dur in by_op.most_common(topk):
        print(f"| {op} | {dur / 1e3:.2f} | {100 * dur / total:.1f} "
              f"| {calls[op]} |")


if __name__ == "__main__":
    main()
