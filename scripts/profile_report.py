#!/usr/bin/env python
"""Summarize a jax.profiler xplane capture: per-HLO-op TPU time.

Usage:  python scripts/profile_report.py /path/to/profile_dir [top_n]

Reads the newest ``*.xplane.pb`` under the directory (the layout
``profile_dir/plugins/profile/<ts>/<host>.xplane.pb`` that
``jax.profiler.start_trace`` writes — the train app's ``profile_dir=`` flag
captures steps 10-20). Prints the TPU plane's ops aggregated by name with a
coarse category roll-up (matmul/conv, Pallas custom-calls, copies/transfers,
fusions), so "where does the step go" is answerable without TensorBoard.

Requires the protobuf pure-python fallback for tensorflow's bundled protos:
the script re-execs itself with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
when needed.

CAVEAT (measured): per-op durations in these captures are IN-FLIGHT SPANS,
not exclusive execution time — the batch-8 step's op-times summed to 19.4 ms
against a 10.1 ms wall, and a layernorm the trace charged 0.167 ms measured
~5 µs in a dependency-chained microbench. Use the per-program ms/exec line
for wall truth and the op table for RELATIVE structure; confirm any
single-op conclusion with an in-graph microbench delta (CLAUDE.md).
"""

import collections
import glob
import os
import sys

if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def categorize(name: str) -> str:
    # classify by the HLO op NAME (before " = ") plus the op kind right after
    # it — matching the whole HLO text misfiles fusions whose bodies mention
    # transpose/copy. NOTE: *-start/*-done pairs are ASYNC DMAs whose spans
    # overlap compute; the roll-up double-counts them vs wall time (compare
    # the program ms/exec line) — they show WHAT is in flight, not added cost.
    n = name.lower()
    op = n.split(" = ", 1)[0]
    if " custom-call(" in n:
        return "pallas/custom-call"
    if any(k in op for k in ("copy-start", "copy-done", "slice-start",
                             "slice-done")) or " copy-start(" in n \
            or " slice-start(" in n or " copy-done(" in n \
            or " slice-done(" in n:
        return "async DMA (overlaps)"
    # fusion roots: the name XLA gives a fusion encodes its root op
    if any(k in op for k in ("convolution", "dot", "einsum")) \
            or " dot(" in n or " convolution(" in n:
        return "matmul/conv"
    if " copy(" in n or " transpose(" in n or op.startswith(
            ("%copy", "%transpose", "%bitcast")):
        return "copies/layout"
    if " fusion(" in n:
        return "fusion"
    if any(k in n for k in (" all-reduce(", " all-gather(",
                            " reduce-scatter(", " collective-permute(")):
        return "collectives"
    if "infeed" in n or "outfeed" in n:
        return "host transfer"
    return "other"


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.xplane.pb under {root}")
    path = paths[-1]
    print(f"# {path}")

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        if "TPU" not in p.name:
            continue
        em = {k: v.name for k, v in p.event_metadata.items()}
        dur = collections.Counter()
        cnt = collections.Counter()
        step_dur = collections.Counter()
        step_cnt = collections.Counter()
        for line in p.lines:
            for e in line.events:
                nm = em.get(e.metadata_id, str(e.metadata_id))
                ms = e.duration_ps / 1e9
                if nm.startswith("jit_"):
                    step_dur[nm] += ms
                    step_cnt[nm] += 1
                    continue
                if nm.isdigit():  # step-number envelope lines
                    continue
                dur[nm] += ms
                cnt[nm] += 1

        print(f"\n== plane {p.name}")
        for nm, d in step_dur.most_common(8):
            print(f"program {nm[:70]}: {d:.2f} ms total over "
                  f"{step_cnt[nm]} executions = {d / step_cnt[nm]:.3f} ms/exec")

        cats = collections.Counter()
        for nm, d in dur.items():
            cats[categorize(nm)] += d
        total = sum(cats.values())
        print(f"\nop-time roll-up ({total:.1f} ms captured):")
        for c, d in cats.most_common():
            print(f"  {d:9.2f} ms  {100 * d / total:5.1f}%  {c}")

        print(f"\ntop {top_n} ops:")
        for nm, d in dur.most_common(top_n):
            print(f"{d:9.3f} ms x{cnt[nm]:5d}  [{categorize(nm):>20s}] "
                  f"{nm[:95]}")


if __name__ == "__main__":
    main()
