"""Driver entry-point contracts.

The critical property pinned here: ``dryrun_multichip`` must be HERMETIC
against a broken session default backend.  Round-2 post-mortem
(MULTICHIP_r02.json): the tiny-scene setup ran eager ops on the session's
default (axon TPU) backend before the CPU guard was entered, so a libtpu
client/terminal mismatch on the tunnel killed the dryrun even though the
mesh math was fine.  The fix forces ``jax_platforms=cpu`` before any array
op; this test proves it by running the dryrun in a subprocess whose default
backend is deliberately poisoned (JAX_PLATFORMS=tpu with no TPU plugin on
the path), so *any* touch of the default backend raises.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_hermetic_against_poisoned_backend():
    env = dict(os.environ)
    # Strip the axon relay plugin so the poisoned platform below is genuinely
    # unavailable (with axon on the path, "tpu" could resolve via the tunnel).
    env["PYTHONPATH"] = ":".join(
        [REPO]
        + [p for p in env.get("PYTHONPATH", "").split(":")
           if p and ".axon_site" not in p]
    )
    # Poison: a default platform that cannot initialise. If dryrun_multichip
    # runs ANY eager op before forcing the CPU platform, jax tries to init
    # this backend and the subprocess dies — exactly the round-2 failure mode.
    env["JAX_PLATFORMS"] = "tpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip not hermetic:\nstdout={proc.stdout}\n"
        f"stderr={proc.stderr[-4000:]}"
    )
    assert "dryrun_multichip(8): OK" in proc.stdout


def test_entry_compiles_and_runs():
    import jax

    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    fn, args = g.entry()
    rgb, depth = jax.jit(fn)(*args)
    assert rgb.shape == (1024, 3) and depth.shape == (1024,)
    assert bool(jax.numpy.isfinite(rgb).all())
