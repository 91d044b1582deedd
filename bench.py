#!/usr/bin/env python
"""Benchmark: full training-step throughput (rays/sec) at paper settings.

Runs the complete fused train step — 1024 rays x 128 samples through the
256-wide MLP, plus the reference-pair losses (tiled Chamfer over
(540/4)x(960/4) = 32,400-point clouds, surface photometric reprojection) and
the 4-group Adam update — exactly the workload of one reference
`Trainer.train_step` (model/training.py:67-97), in the production
epoch-scan mode (K steps per device dispatch).

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / BASELINE}

Outage resilience (round 4): the round-3 driver bench was zeroed by a single
transient backend-init failure (BENCH_r03.json rc=1, axon "UNAVAILABLE").
A failed backend init poisons the whole process (jax caches it), so the
retry has to be a PROCESS retry: the parent re-runs the benchmark as a
subprocess up to BENCH_ATTEMPTS times with BENCH_RETRY_BACKOFF_S between
attempts, forwarding the child's JSON line verbatim on success.

BASELINE_RAYS_PER_SEC: the reference implementation runs ~10 train
iterations/sec x 1024 rays on a single modern NVIDIA GPU (estimated from its
per-`print_every` timing line, reference train.py:218-222; no published
number exists in-repo — see BASELINE.md). Revise when a measured figure is
available.
"""
import json
import os
import sys
import time

BENCH_ATTEMPTS = 3
BENCH_RETRY_BACKOFF_S = 60.0


def _supervise():
    """Run the benchmark in a child process with bounded retries; relay its
    stdout (the single JSON line) and exit with its final return code."""
    import subprocess

    env = dict(os.environ, _BENCH_CHILD="1")
    last_rc = 1
    for attempt in range(BENCH_ATTEMPTS):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        if proc.stderr:
            sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and proc.stdout.strip():
            sys.stdout.write(proc.stdout)
            sys.stdout.flush()
            return 0
        last_rc = proc.returncode or 1
        if attempt < BENCH_ATTEMPTS - 1:
            sys.stderr.write(
                f"[bench] attempt {attempt + 1}/{BENCH_ATTEMPTS} failed "
                f"(rc={proc.returncode}); retrying in "
                f"{BENCH_RETRY_BACKOFF_S:.0f}s\n"
            )
            sys.stderr.flush()
            time.sleep(BENCH_RETRY_BACKOFF_S)
    return last_rc


# importing jax does NOT initialize a backend (that happens at first device
# use, inside the child) — the parent supervisor stays outage-immune
import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 10240.0

H, W = 540, 960
N_RAYS = 1024
N_FRAMES = 8
WARMUP_DISPATCHES = 2
SCAN_STEPS = 192        # steps fused per dispatch; production epochs scan
                        # n_views steps (Tanks Ignatius: ~230 train views) —
                        # raised from 64 in r3 to track production dispatch
                        # amortisation and to cut wall-clock measurement
                        # noise (single 128-step runs varied +-1.3% through
                        # the relay; device-trace step time is 17.1 ms)
MEASURE_DISPATCHES = 3  # 576 steps measured


def build():
    from nope_nerf_tpu.config import DEFAULT_CONFIG, load_config
    from nope_nerf_tpu.training.loop import build_params
    from nope_nerf_tpu.training.trainer import (
        init_train_state,
        make_epoch_step,
        make_render_cfg,
    )

    cfg = load_config(DEFAULT_CONFIG, default_path=None)
    cfg["training"]["out_dir"] = "/tmp/bench_out"
    cfg["_num_cams"] = N_FRAMES
    # variant measurements (opt-in modes, k-multiplier scaling): merge a
    # JSON dict into cfg["tpu"], e.g. BENCH_TPU_OVERRIDES='{"chamfer_mode":
    # "grid"}'. The headline bench is the default config (no overrides).
    import os
    overrides = os.environ.get("BENCH_TPU_OVERRIDES")
    if overrides:
        cfg["tpu"] = {**cfg.get("tpu", {}), **json.loads(overrides)}

    rng = np.random.default_rng(0)

    class _Scene:
        N_imgs = N_FRAMES
        K = np.array(
            [[2 * 0.8, 0, 0, 0], [0, -2 * 0.9, 0, 0], [0, 0, -1, 0],
             [0, 0, 0, 1]],
            np.float32,
        )
        scale_mat = np.eye(4, dtype=np.float32)
        c2ws = None

    scene = _Scene()
    params, init_c2w = build_params(cfg, scene, jax.random.PRNGKey(0))
    state, _ = init_train_state(params)
    epoch_fn = make_epoch_step(cfg, make_render_cfg(cfg), init_c2w)

    imgs = jnp.asarray(rng.uniform(size=(N_FRAMES, H, W, 3)), jnp.float32)
    dpts = jnp.asarray(1.0 + rng.uniform(size=(N_FRAMES, H, W)), jnp.float32)
    # production layout (loop.scene_batch_arrays): precomputed pc_ratio pyramid
    from nope_nerf_tpu.ops.interp import resize_bilinear, resize_nearest

    ratio = cfg["training"]["pc_ratio"]
    sres = (int(H / ratio), int(W / ratio))
    scene_arrays = {
        "imgs": imgs,
        "dpts": dpts,
        "dpts_small": jax.vmap(lambda d: resize_nearest(d, sres))(dpts),
        "imgs_small": jax.vmap(lambda im: resize_bilinear(im, sres))(imgs),
        "camera_mat_gt": jnp.asarray(scene.K),
        "scale_mat": jnp.asarray(scene.scale_mat),
    }
    scalars = {
        "weights": {
            "rgb_weight": np.float32(1.0),
            "depth_weight": np.float32(0.04),
            "pc_weight": np.float32(1.0),
            "rgb_s_weight": np.float32(1.0),
            "depth_consistency_weight": np.float32(0.0),
            "weight_dist_1st_loss": np.float32(0.0),
            "weight_dist_2nd_loss": np.float32(0.0),
        },
        "w_l1": np.float32(1.0),
        "w_l2": np.float32(0.0),
        "lrs": {g: np.float32(1e-3) for g in
                ("nerf", "pose", "focal", "distortion")},
    }
    static = {"render_model": True, "use_ref": True, "use_rgb_s": True}
    idxs = np.arange(SCAN_STEPS) % N_FRAMES
    k = int(cfg.get("tpu", {}).get("rays_per_step_multiplier", 1))
    if k > 1:
        # (steps, k) frame indices, exactly the production loop's layout
        # (training/loop.py: frame 0 keeps the epoch order)
        extra = (idxs[:, None] + 1 + np.arange(k - 1)[None]) % N_FRAMES
        idxs = np.concatenate([idxs[:, None], extra], axis=1)
    idxs = jnp.asarray(idxs, jnp.int32)
    refs = jnp.asarray((np.arange(SCAN_STEPS) + 1) % N_FRAMES, jnp.int32)
    return state, epoch_fn, scene_arrays, idxs, refs, scalars, static


def main():
    state, epoch_fn, scene_arrays, idxs, refs, scalars, static = build()
    key = jax.random.PRNGKey(0)
    for i in range(WARMUP_DISPATCHES):
        state, aux, _ = epoch_fn(
            state, scene_arrays, idxs, refs, scalars,
            jax.random.fold_in(key, i), static,
        )
    _ = float(aux["loss"])  # hard sync (relay block_until_ready under-waits)
    t0 = time.perf_counter()
    prev_aux = None
    for i in range(MEASURE_DISPATCHES):
        state, aux, _ = epoch_fn(
            state, scene_arrays, idxs, refs, scalars,
            jax.random.fold_in(key, 100 + i), static,
        )
        # pipelined sync, exactly like the production loop
        # (training/loop.py: metrics for epoch e are fetched while epoch
        # e+1 runs on device) — the dispatch round-trip hides behind compute
        if prev_aux is not None:
            _ = float(prev_aux["loss"])
        prev_aux = aux
    _ = float(prev_aux["loss"])
    dt = time.perf_counter() - t0
    steps = MEASURE_DISPATCHES * SCAN_STEPS
    # with rays_per_step_multiplier k, each step consumes k frame-batches
    k = idxs.shape[1] if idxs.ndim > 1 else 1
    rays_per_sec = steps * N_RAYS * k / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
                # the torch reference publishes no throughput number and is
                # not runnable here (no GPU / no dataset): the denominator is
                # the ~10 it/s x 1024 rays ESTIMATE from BASELINE.md, not a
                # measurement
                "baseline": "estimated",
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
