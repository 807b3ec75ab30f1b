"""Rank XLA ops from a jax.profiler perfetto trace (VERDICT r2 next #3:
name the top sinks in the non-DAMSM part of the train step).

Reads the trace json that scripts/capture_trace.py writes and aggregates
device op slices by the XLA-recorded `tf_op` metadata path (e.g.
`jit(step)/transpose(jvp(GNet))/NextStageG_1/UpBlock_0/Conv3x3_0/...`),
which survives fusion — the bare fusion names (`fusion.2007`) do not.
Three views: forward-vs-backward, per top-2-level module, per exact site.
Absolute times through the axon tunnel are unreliable (CLAUDE.md); the
RELATIVE shares are the signal.

Usage: python scripts/summarize_trace.py <trace_dir> [steps] [topk]
  steps: how many train steps the trace window covered (default 3,
         matching capture_trace.py) — used only to print ms/step.
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
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
        + glob.glob(os.path.join(root, "**", "*perfetto*"), recursive=True)
    )
    if not hits:
        raise SystemExit(f"no trace json under {root}")
    return hits[0]


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"] if isinstance(data, dict) else data


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sba_trace_lam0"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    path = find_trace(root)
    events = load_events(path)

    xs = [e for e in events
          if e.get("ph") == "X" and "dur" in e
          and e.get("args", {}).get("tf_op")]
    if not xs:
        raise SystemExit(
            "no tf_op-annotated slices — was the trace captured with "
            "jax.profiler (capture_trace.py)?")
    total = sum(e["dur"] for e in xs)
    print(f"trace: {path}")
    print(f"device op slices: {total / 1e3:.1f} ms total over {steps} "
          f"steps -> {total / 1e3 / steps:.1f} ms/step")

    def agg(keyfn, title, k):
        a = collections.Counter()
        c = collections.Counter()
        for e in xs:
            key = keyfn(e)
            a[key] += e["dur"]
            c[key] += 1
        print(f"\n== {title} ==")
        print("| what | ms/step | % | slices/step |")
        print("|---|---|---|---|")
        for key, d in a.most_common(k):
            print(f"| {key} | {d / 1e3 / steps:.2f} | "
                  f"{100 * d / total:.1f} | {c[key] // steps} |")

    def direction(e):
        t = e["args"]["tf_op"]
        if "transpose(jvp" in t:
            return "backward"
        if "jvp(" in t:
            return "forward"
        return "other (opt/loss/misc)"

    def module(e):
        t = e["args"]["tf_op"]
        d = "bwd " if "transpose(jvp" in t else ("fwd " if "jvp(" in t
                                                 else "")
        m = re.search(
            r"jit\(\w+\)/(?:transpose\()?(?:jvp\()?([A-Za-z0-9_]+)\)?/?"
            r"([A-Za-z0-9_]+)?", t)
        if not m:
            return d + t[:60]
        return d + (m.group(1) or "?") + "/" + (m.group(2) or "")

    def site(e):
        return re.sub(r"^jit\(\w+\)/", "", e["args"]["tf_op"])

    agg(direction, "forward vs backward", 5)
    agg(module, "per top-2-level module", topk)
    agg(site, "per exact site", topk)


if __name__ == "__main__":
    main()
