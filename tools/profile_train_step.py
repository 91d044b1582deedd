#!/usr/bin/env python
"""Trace the bench train step on device and print a per-op self-time table.

Wall-clock through a TPU relay wobbles run-to-run (~±1.3% measured r3) and
`jax.block_until_ready` under-waits there, so sub-5% kernel comparisons MUST
come from device traces. This tool runs the exact bench workload (or any
`BENCH_TPU_OVERRIDES` variant) under `jax.profiler.trace` and aggregates the
device lane into per-step self-times — the instrument behind the step
profiles recorded in BASELINE.md/PARITY.md.

Usage (on the TPU host):
    PYTHONPATH=.:/root/.axon_site python tools/profile_train_step.py
    BENCH_TPU_OVERRIDES='{"chamfer_mode":"grid"}' python tools/profile_train_step.py

Reference counterpart: none — the reference prints wall-clock deltas only
(`train.py:218-222`); SURVEY.md §5.1 calls for this superset.
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir, steps):
    """Self-time (total minus nested children) per op name on the device
    lane, in ms/step."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    d = json.load(gzip.open(paths[-1]))
    pids = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    evs = [e for e in d["traceEvents"]
           if e.get("ph") == "X" and e["pid"] in dev_pids]
    bytid = collections.defaultdict(list)
    for e in evs:
        bytid[e["tid"]].append(e)
    agg = collections.Counter()
    cnt = collections.Counter()
    for lst in bytid.values():
        lst.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in lst:
            while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
                stack.pop()
            if stack:
                agg[stack[-1]["name"]] -= e["dur"]
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            stack.append(e)
    return [(dur / 1e3 / steps, cnt[name], name)
            for name, dur in agg.most_common()]


def main():
    import jax

    import bench

    state, epoch_fn, scene_arrays, idxs, refs, scalars, static = bench.build()
    key = jax.random.PRNGKey(0)
    for i in range(2):  # compile + warm
        state, aux, _ = epoch_fn(state, scene_arrays, idxs, refs, scalars,
                                 jax.random.fold_in(key, i), static)
    _ = float(aux["loss"])  # hard sync (relay block_until_ready under-waits)

    trace_dir = os.environ.get("PROFILE_DIR") or tempfile.mkdtemp(
        prefix="step_trace_")
    with jax.profiler.trace(trace_dir):
        for i in range(2):
            state, aux, _ = epoch_fn(state, scene_arrays, idxs, refs,
                                     scalars, jax.random.fold_in(key, 100 + i),
                                     static)
        _ = float(aux["loss"])

    steps = 2 * bench.SCAN_STEPS
    print(f"# per-step self-time over {steps} steps (trace: {trace_dir})")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for ms, n, name in aggregate(trace_dir, steps):
        if ms < 0.02:
            break
        print(f"{ms:9.3f}  {n:6d}  {name[:90]}")


if __name__ == "__main__":
    main()
