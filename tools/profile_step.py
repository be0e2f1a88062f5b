"""Capture + aggregate a device profile of the e2e b=8 train step.

Usage:
  python tools/profile_step.py [--batch 8] [--steps 5] [--out /tmp/prof]
          [--top 40] [--bn_two_pass] [--parse_only]

Captures a jax.profiler trace around `steps` full training steps of the
REAL input path (HBM-resident window gather + normalize + fused train
step, multimodal_outage_tpu/benchmarks.py:_e2e_train_seconds), then
parses the xplane proto ("XLA Ops" line of the TPU device plane) and
prints per-op and per-category exclusive device time.

This is the receipts generator for the copy-stall/layout experiments
(BENCHMARKS.md "Train-step profile"): run it before/after a candidate
change and diff the category table.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_ASYNC = ("copy-start", "copy-done", "send", "recv", "collective-permute-start")


def categorize(op_name: str) -> str:
    """Bucket a SYNC XLA op name (async DMA spans are handled separately —
    their durations overlap compute and must not be summed as busy time)."""
    n = op_name.lower().lstrip("%")
    if n.startswith("copy") or n.startswith("transpose"):
        return "sync_copy_layout"  # layout-conversion copies — real device time
    if "convert_reduce" in n:
        return "convert_reduce"
    if "multiply_add" in n or n.startswith("dot") or n.startswith("conv"):
        return "multiply_add"
    if "reduce-window" in n or "select-and-scatter" in n or "pool" in n:
        return "pool"
    if "reverse" in n:
        return "reverse"
    if "fusion" in n or "loop" in n:
        return "elementwise_fusion"
    return "other"


def _is_async(name: str) -> bool:
    n = name.lower().lstrip("%")
    return any(n.startswith(a) for a in _ASYNC)


def _merge(intervals):
    """Sorted, disjoint union of [start, end) intervals — the ONE merge
    routine behind both busy time and stall computation."""
    flat = []
    for s, e in sorted(intervals):
        if flat and s <= flat[-1][1]:
            flat[-1][1] = max(flat[-1][1], e)
        else:
            flat.append([s, e])
    return flat


def _union_len(intervals) -> float:
    return sum(e - s for s, e in _merge(intervals))


def parse_xplane(profile_dir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_op: collections.Counter = collections.Counter()
    occurrences: collections.Counter = collections.Counter()
    sync_iv, async_iv = [], []
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                start = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e9  # ms
                end = start + ev.duration_ps / 1e9
                if _is_async(name):
                    async_iv.append((start, end))
                    continue  # span overlaps compute; not busy time
                per_op[name] += ev.duration_ps / 1e9  # ps → ms
                occurrences[name] += 1
                sync_iv.append((start, end))

    busy = _union_len(sync_iv)
    # async DMA time NOT hidden under sync compute = true copy stall:
    # |union(async) \ union(sync)|
    stall = 0.0
    flat_sync = _merge(sync_iv)
    for s, e in _merge(async_iv):
        cur = s
        for fs, fe in flat_sync:
            if fe <= cur:
                continue
            if fs >= e:
                break
            if fs > cur:
                stall += fs - cur
            cur = max(cur, fe)
            if cur >= e:
                break
        if cur < e:
            stall += e - cur
    return per_op, occurrences, busy, stall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/prof_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--bn_two_pass", action="store_true")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        import numpy as np

        from multimodal_outage_tpu import benchmarks as B

        # the EXACT program the headline bench runs (shared setup; see
        # benchmarks.make_e2e_setup — keeps this receipt from drifting)
        b = args.batch
        su = B.make_e2e_setup(
            b, donate=False, bn_single_pass=not args.bn_two_pass
        )
        ds, pipe, step = su["ds"], su["pipe"], su["step"]
        state, supports = su["state"], su["supports"]
        lr, rng = su["lr"], su["rng"]

        def run(state, i):
            batch = pipe.batch(ds, (np.arange(b) + i) % (len(ds) - b))
            return step(state, batch, supports, lr, rng)

        # compile + warm outside the trace
        state, m = run(state, 0)
        B._fetch(m["loss"])
        with jax.profiler.trace(args.out):
            for i in range(1, args.steps + 1):
                state, m = run(state, i)
            B._fetch(m["loss"])
        print(f"trace captured to {args.out}", file=sys.stderr)
        n_steps = args.steps
    else:
        n_steps = args.steps

    per_op, occ, busy, stall = parse_xplane(args.out, args.top)
    total = sum(per_op.values())
    print(f"\n== sync device time {total / n_steps:.1f} ms/step "
          f"(busy union {busy / n_steps:.1f}, async-DMA stall "
          f"{stall / n_steps:.1f}) over {n_steps} steps ==")
    print(f"{'ms/step':>9} {'share':>6} {'count':>6}  op")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / n_steps:9.3f} {ms / total * 100:5.1f}% "
              f"{occ[name]:6d}  {name[:130]}")

    cats: collections.Counter = collections.Counter()
    for name, ms in per_op.items():
        cats[categorize(name)] += ms
    print("\n== per-category (sync ops) ==")
    for cat, ms in cats.most_common():
        print(f"{ms / n_steps:9.3f} {ms / total * 100:5.1f}%  {cat}")


if __name__ == "__main__":
    main()
