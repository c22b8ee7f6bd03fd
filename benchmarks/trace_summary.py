"""Summarize a jax.profiler trace: per-op self time on the device.

Usage:  python benchmarks/trace_summary.py /tmp/trace_dir [top_n]

Reads the Chrome-trace JSON that jax.profiler.trace() writes alongside
the xplane protobuf (no tensorboard dependency) and prints ops ranked by
SELF time (duration minus contained children on the same thread) for the
"XLA Ops" device threads.  Gap time inside control-flow ops (while /
conditional self time) is the launch/sequencing overhead of their bodies
— thousands of tiny ops show up there, not in any leaf.
"""

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        return json.load(f)["traceEvents"]


def self_times(events, thread_name="XLA Ops"):
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_tid = collections.defaultdict(list)
    for e in events:
        if (e.get("ph") == "X"
                and tids.get((e.get("pid"), e.get("tid"))) == thread_name):
            by_tid[(e["pid"], e["tid"])].append(
                (e["ts"], e["ts"] + e.get("dur", 0), e["name"],
                 e.get("dur", 0))
            )
    agg = collections.Counter()
    cnt = collections.Counter()
    for _, evs in by_tid.items():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # (start, end, name, dur, idx)
        child = collections.defaultdict(float)
        for i, (s, e_, name, dur) in enumerate(evs):
            while stack and stack[-1][1] <= s:
                _, _, nm, d, ci = stack.pop()
                agg[nm] += d - child[ci]
                cnt[nm] += 1
            if stack:
                child[stack[-1][4]] += dur
            stack.append((s, e_, name, dur, i))
        while stack:
            _, _, nm, d, ci = stack.pop()
            agg[nm] += d - child[ci]
            cnt[nm] += 1
    return agg, cnt


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    agg, cnt = self_times(load_events(trace_dir))
    total = sum(agg.values())
    print(f"total device self time: {total/1e3:.1f} ms")
    for name, us in agg.most_common(top_n):
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:7d}  {name[:90]}")


if __name__ == "__main__":
    main()
