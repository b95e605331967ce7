"""Test configuration: force CPU backend with 8 virtual devices.

This is the standard JAX way to test GSPMD/pjit sharding logic without a pod
(see SURVEY.md §4). The container force-registers a remote-TPU ("axon") PJRT
backend via sitecustomize and JAX_PLATFORMS=axon, so a plain setdefault is
not enough: we must overwrite the env var AND update jax.config after the
site hook has already imported jax.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
# Run the Pallas kernels in interpret mode for the WHOLE suite: every
# model/serving/finetune test then exercises the real kernel path (this
# was previously accidental — test_pallas_fused's module-level env set
# leaked at collection time — and it surfaced a real bug: gradients
# through the kernel in LoRA training; now it's deliberate).
os.environ.setdefault("QFA_PALLAS_INTERPRET", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# two-tier suite: `pytest -m fast` is the <3 min smoke pass; the heavy
# trained-model / multi-device integration modules get `slow` (full suite
# runs them; split with `-m "not slow"` / `-m slow` to parallelize)
_FAST_MODULES = {
    "test_codebooks", "test_hadamard", "test_ldlq", "test_calibration",
    "test_qlinear", "test_fusion", "test_grouped_prologue",
    "test_bench_supervisor", "test_pallas_fused", "test_resume",
    "test_tp_shards", "test_sharded_checkpoint", "test_qwen_yi",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        has = {m.name for m in item.iter_markers()}
        if "fast" in has or "slow" in has:
            continue
        item.add_marker(pytest.mark.fast if mod in _FAST_MODULES
                        else pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
