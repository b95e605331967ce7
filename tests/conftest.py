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


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
