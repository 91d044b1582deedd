"""Executed A/B of the reference's OWN DPT depth net vs the JAX port.

Every prior round could only *transcribe* `DPT/dpt/{vit,blocks,models}.py`
(timm is absent, so the reference DPT package was stubbed out as a raiser).
`tools/timm_stub.py` now provides an executable from-scratch
``timm.create_model('vit_base_resnet50_384')`` with timm's module tree, so
this file EXECUTES the reference's real ``DPTDepthModel`` — its
``forward_flex`` hybrid embed, forward hooks, readout projections,
reassemble, fusion decoder and scale/shift/invert head
(`DPT/dpt/vit.py:103-201,256-377`, `models.py:93-212`) — and asserts:

* the reference model's ``state_dict()`` reproduces the published
  checkpoint key layout the converter fixture has pinned since r1
  (`tests/test_dpt_convert.py::synth_state_dict`) key for key, shape for
  shape — the fixture is now executed evidence, not transcription;
* ``tools/convert_dpt.py`` consumes that state_dict unchanged and
  ``apply_dpt`` reproduces the reference forward on the same image
  (the full migration chain with the reference as the oracle);
* the reference's own on-disk checkpoint (``BaseModel.load`` layout,
  `DPT/dpt/base_model.py:5-17`) round-trips through the converter CLI path.

Real PUBLISHED weight values remain unverifiable here (no network); this
closes the architecture/converter half of that standing gap with the
reference code itself as the oracle.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_dpt import convert  # noqa: E402
import reference_exec as rx  # noqa: E402

from test_dpt_convert import synth_state_dict  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nope_nerf_tpu.models import dpt as jdpt  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="reference checkout not present")

# the values every reference config ships for the DPT head
# (`configs/default.yaml` depth.scale/shift)
SCALE, SHIFT = 0.000305, 0.1378


@pytest.fixture(scope="module")
def ref_model():
    dpt_models = rx.load_reference_dpt()
    torch.manual_seed(0)
    model = dpt_models.DPTDepthModel(
        backbone="vitb_rn50_384", non_negative=True,
        scale=SCALE, shift=SHIFT, invert=True, freeze=True)
    model.eval()
    # Randomise every tensor (default init leaves cls/pos_embed zero and the
    # ReLU head mostly clipped); N(0, .05) + positive head bias keeps the
    # inverse depth non-trivially textured through scale/shift/invert.
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05, generator=gen)
        model.scratch.output_conv[4].bias.fill_(0.3)
    return model


def test_state_dict_layout_is_the_synth_fixture(ref_model):
    """The executed reference model's state_dict == the r1 converter fixture
    (key set AND shapes) — `tests/test_dpt_convert.py:38-122`."""
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    synth = synth_state_dict(np.random.default_rng(0))
    assert set(sd) == set(synth), (
        f"only-in-reference: {sorted(set(sd) - set(synth))[:6]} "
        f"only-in-fixture: {sorted(set(synth) - set(sd))[:6]}")
    for k in synth:
        assert sd[k].shape == synth[k].shape, (
            f"{k}: reference {sd[k].shape} vs fixture {synth[k].shape}")


def test_forward_parity_converted_weights(ref_model):
    """reference DPTDepthModel.forward == apply_dpt(convert(state_dict))
    on the same image (the real weight-migration chain, executed)."""
    rng = np.random.default_rng(3)
    img = rng.uniform(-1.0, 1.0, size=(96, 128, 3)).astype(np.float32)

    with torch.no_grad():
        want = ref_model(
            torch.from_numpy(img.transpose(2, 0, 1))[None]
        )[0].numpy()

    params = convert({k: v.numpy() for k, v in ref_model.state_dict().items()})
    got = np.asarray(jdpt.apply_dpt(
        jax.tree.map(jnp.asarray, params), jnp.asarray(img),
        scale=SCALE, shift=SHIFT))

    assert got.shape == want.shape == (96, 128)
    # depth must be non-trivial for the comparison to mean anything
    assert want.std() > 1e-4, "reference output is constant; weak fixture"
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_ondisk_checkpoint_roundtrip(ref_model, tmp_path):
    """The reference's own ``BaseModel.load`` layout (`base_model.py:5-17`)
    written to disk drives both sides identically: a second reference model
    restored from the file matches, and the converter consumes the same
    file's state_dict with every key read."""
    path = str(tmp_path / "dpt_hybrid-synth.pt")
    torch.save(ref_model.state_dict(), path)

    dpt_models = rx.load_reference_dpt()
    reloaded = dpt_models.DPTDepthModel(
        path=path, backbone="vitb_rn50_384", non_negative=True,
        scale=SCALE, shift=SHIFT, invert=True, freeze=True)
    reloaded.eval()

    rng = np.random.default_rng(5)
    img = rng.uniform(-1.0, 1.0, size=(64, 96, 3)).astype(np.float32)
    xt = torch.from_numpy(img.transpose(2, 0, 1))[None]
    with torch.no_grad():
        a = ref_model(xt)[0].numpy()
        b = reloaded(xt)[0].numpy()
    np.testing.assert_array_equal(a, b)

    state = torch.load(path, map_location="cpu")
    read = set()

    class _Track(dict):
        def __getitem__(self, k):
            read.add(k)
            return super().__getitem__(k)

    tracked = _Track({k: v.numpy() for k, v in state.items()})
    convert(tracked)
    assert read == set(tracked), "converter ignored reference-written keys"
