"""Runtime sanitizer (utils/sanitize.py): the race-detection /
sanitizer role of SURVEY.md §5 — determinism, purity, finiteness, and
kernel-variant parity checks, each validated both ways (passes on a
clean program, flags an injected fault)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.models.config import tiny_config
from quip_for_all_tpu.utils.random_quantized import (random_qlinear,
                                                     random_quantized_model)
from quip_for_all_tpu.utils.sanitize import (VARIANT_KNOBS,
                                             check_determinism,
                                             check_finite, check_purity,
                                             check_variant_parity,
                                             sanitize_decode_step)


def test_determinism_passes_on_jitted_fn():
    @jax.jit
    def f(x):
        return jnp.cumsum(x * 2.0), x.sum()

    rep = check_determinism(f, (jnp.arange(16, dtype=jnp.float32),))
    assert rep.ok, rep.summary()


def test_determinism_flags_impure_fn():
    state = {"n": 0}

    def f(x):
        state["n"] += 1
        return x + state["n"]

    rep = check_determinism(f, (jnp.ones(4),))
    assert not rep.ok
    assert rep.findings[0].check == "determinism"
    with pytest.raises(AssertionError):
        check_determinism(f, (jnp.ones(4),), strict=True)


def test_purity_passes_on_functional_fn():
    rep = check_purity(jax.jit(lambda x: x * 2), (jnp.ones((4, 4)),))
    assert rep.ok, rep.summary()


def test_purity_flags_inplace_mutation():
    def f(a):
        a *= 2  # in-place on the caller's numpy buffer
        return a.sum()

    rep = check_purity(f, (np.ones(8),))
    assert not rep.ok
    assert "mutated" in rep.findings[0].detail


def test_finite_flags_nan_and_inf():
    tree = {"a": jnp.ones(3), "b": jnp.asarray([1.0, float("nan")]),
            "c": np.asarray([np.inf, 0.0]), "ints": np.arange(3)}
    rep = check_finite(tree)
    assert len(rep.findings) == 2
    assert check_finite({"x": jnp.zeros(2)}).ok


@pytest.mark.parametrize("cb_id", ["E8P12", "E8P12RVQ4B"])
def test_variant_parity_clean(cb_id):
    """All documented-bit-exact kernel variants agree with the base
    knobs on a random QuantizedTensor (interpret-mode kernel on CPU)."""
    cb = get_codebook(cb_id)
    p = random_qlinear(cb, 256, 256, np.random.default_rng(3))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 256)),
                    dtype=jnp.bfloat16)
    rep = check_variant_parity(p.qweight, x)
    assert rep.ok, rep.summary()
    assert rep.checks_run == ["variant_parity"]


def test_variant_parity_env_restored(monkeypatch):
    monkeypatch.setenv("QFA_KSPLIT", "3")
    cb = get_codebook("E8P12")
    p = random_qlinear(cb, 256, 128, np.random.default_rng(4))
    x = jnp.asarray(np.zeros((2, 256)), dtype=jnp.bfloat16)
    check_variant_parity(p.qweight, x)
    import os
    assert os.environ["QFA_KSPLIT"] == "3"


def test_sanitize_decode_step_tiny_model():
    cfg = tiny_config()
    params = random_quantized_model(cfg, codebook="E8P12", seed=0)
    rep = sanitize_decode_step(cfg, params, repeats=2)
    assert rep.ok, rep.summary()
    assert set(rep.checks_run) == {"determinism", "purity", "finite"}
