"""Executed A/B of the config loader against the reference.

``nope_nerf_tpu/config.py`` claims an IDENTICAL two-level YAML merge to the
reference's `dataloading/configloading.py:1-45` — the property that makes
reference scene configs drop-in. These tests run the reference's OWN
``load_config``/``update_recursive`` (loaded by file path; it imports only
yaml) against ours on every config YAML shipped in BOTH repos and assert
dict equality.
"""
import glob
import importlib.util
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import reference_exec as rx  # noqa: E402

from nope_nerf_tpu import config as our_config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not rx.reference_available(), reason="/root/reference not present"
)

REPO_CONFIGS = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "**", "*.yaml"), recursive=True))
REF_CONFIGS = sorted(
    glob.glob(os.path.join(rx.REFERENCE_DIR, "configs", "**", "*.yaml"),
              recursive=True))


@pytest.fixture(scope="module")
def ref_loader():
    path = os.path.join(rx.REFERENCE_DIR, "dataloading", "configloading.py")
    spec = importlib.util.spec_from_file_location("ref_configloading", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _default_of(paths):
    for p in paths:
        if os.path.basename(p) == "default.yaml":
            return p
    raise AssertionError("no default.yaml found")


class TestConfigMergeParity:
    def test_our_configs_load_identically(self, ref_loader):
        """All shipped configs of THIS repo through both loaders."""
        default = _default_of(REPO_CONFIGS)
        scenes = [p for p in REPO_CONFIGS if p != default]
        assert scenes, "no scene configs found"
        for p in scenes:
            ref = ref_loader.load_config(p, default)
            ours = our_config.load_config(p, default)
            assert ours == ref, f"merge diverged for {p}"

    def test_reference_configs_load_identically(self, ref_loader):
        """The reference's OWN scene configs merged over its own default —
        drop-in compatibility, executed."""
        default = _default_of(REF_CONFIGS)
        scenes = [p for p in REF_CONFIGS if p != default]
        assert scenes, "no reference scene configs found"
        for p in scenes:
            ref = ref_loader.load_config(p, default)
            ours = our_config.load_config(p, default)
            assert ours == ref, f"merge diverged for {p}"

    def test_update_recursive_semantics(self, ref_loader):
        """The merge helper itself, on a nested dict with the reference's
        quirk: a key missing in dict1 is pre-seeded as {} before non-dict
        assignment (`configloading.py:38-44`)."""
        base = {"a": {"x": 1, "y": {"z": 2}}, "keep": 5}
        over = {"a": {"y": {"z": 9, "new": 1}, "w": 3}, "fresh": {"q": 7}}
        d_ref = {k: (dict(v) if isinstance(v, dict) else v)
                 for k, v in base.items()}
        d_ref["a"]["y"] = dict(base["a"]["y"])
        d_my = {k: (dict(v) if isinstance(v, dict) else v)
                for k, v in base.items()}
        d_my["a"]["y"] = dict(base["a"]["y"])
        ref_loader.update_recursive(d_ref, over)
        our_config.update_recursive(d_my, over)
        assert d_my == d_ref
