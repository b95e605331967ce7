"""QuantLinear forward tests: eval path ≡ dense calc_weight path, decode
round-trips, padding/slicing behavior (SURVEY.md §4: QuantLinear fwd vs
dense reference)."""
import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.nn import qlinear
from quip_for_all_tpu.ops.dequant_xla import decode_weights
from quip_for_all_tpu.ops.qtensor import (
    from_checkpoint_idxs, from_raw_idxs, to_checkpoint_idxs)
from quip_for_all_tpu.transforms.incoherence import get_hadK


def _n_codes(cb):
    return {"D4": 256, "E8P12": 1 << 16, "HI": 16,
            "E8P12RVQ3B": 1 << 24, "E8P12RVQ4B": 1 << 32}[cb.id]


@pytest.mark.parametrize("name", ["D4", "E8P12", "HI", "E8P12RVQ3B",
                                  "E8P12RVQ4B"])
def test_decode_matches_codebook_decode(name, rng):
    cb = get_codebook(name)
    q_out, q_in = 16, 64
    vals = rng.integers(0, _n_codes(cb), size=(q_out, q_in // cb.codesz),
                        dtype=np.uint64)
    raw = vals.astype(np.uint32).view(np.int32)  # wrap like stored codes
    qt = from_raw_idxs(cb, raw, q_out, q_in)
    w_runtime = np.asarray(decode_weights(qt, dtype=jnp.float32))
    w_ref = np.asarray(cb.decode(jnp.asarray(raw)))
    assert np.allclose(w_runtime, w_ref, atol=1e-5)


@pytest.mark.parametrize("name", ["D4", "E8P12", "HI", "E8P12RVQ3B",
                                  "E8P12RVQ4B"])
def test_checkpoint_roundtrip(name, rng):
    cb = get_codebook(name)
    q_out, q_in = 8, 64
    n = _n_codes(cb)
    raw = (rng.integers(0, min(n, 1 << 62), size=(q_out, q_in // cb.codesz))
           % n).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw.view(np.int32), q_out, q_in)
    ck = to_checkpoint_idxs(qt)
    assert ck.dtype == cb.idx_dtype
    qt2 = from_checkpoint_idxs(cb, ck, q_out, q_in)
    for k in qt.planes:
        assert np.array_equal(np.asarray(qt.planes[k]),
                              np.asarray(qt2.planes[k])), (name, k)


@pytest.mark.parametrize("name,per_channel", [("E8P12", False), ("D4", True),
                                              ("HI", False),
                                              ("E8P12RVQ4B", False)])
def test_eval_equals_dense_path(name, per_channel, rng):
    cb = get_codebook(name)
    in_f, out_f = 96, 64  # non-power-of-2 in dim exercises hadK factor
    lspec = get_hadK(in_f, use_rand=True, rng=rng)
    rspec = get_hadK(out_f, use_rand=True, rng=rng)
    raw = (rng.integers(0, 1 << 62, size=(rspec.padN,
                                          lspec.padN // cb.codesz))
           % _n_codes(cb)).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, rspec.padN, lspec.padN)
    wsc = rng.uniform(0.5, 2.0, size=(rspec.padN,)).astype(np.float32)
    p = qlinear.QuantLinearParams(
        qweight=qt,
        Wscale=jnp.asarray(wsc / wsc.mean()) if per_channel else None,
        SU=jnp.asarray(np.sign(rng.standard_normal(in_f)).astype(np.float32)),
        SV=jnp.asarray(np.sign(rng.standard_normal(out_f)).astype(np.float32)),
        bias=jnp.asarray(rng.standard_normal(out_f).astype(np.float32)),
        had_left=None if lspec.hadK is None else jnp.asarray(lspec.hadK),
        had_right=None if rspec.hadK is None else jnp.asarray(rspec.hadK),
        in_features=in_f, out_features=out_f,
        K_left=lspec.K, K_right=rspec.K,
        q_in=lspec.padN, q_out=rspec.padN,
        per_channel=per_channel,
        wscale_float=float(wsc.mean()) if per_channel else 0.73,
    )
    x = rng.standard_normal((5, in_f)).astype(np.float32)
    y_eval = np.asarray(qlinear.apply(p, jnp.asarray(x),
                                      compute_dtype=jnp.float32))
    y_dense = np.asarray(qlinear.apply(p, jnp.asarray(x), training=True))
    assert y_eval.shape == (5, out_f)
    assert np.allclose(y_eval, y_dense, rtol=2e-3, atol=2e-3)


def test_batch_shape_preserved(rng):
    cb = get_codebook("D4")
    in_f = out_f = 64
    raw = (rng.integers(0, 256, size=(64, 16))).astype(np.int32)
    qt = from_raw_idxs(cb, raw, 64, 64)
    p = qlinear.QuantLinearParams(
        qweight=qt, Wscale=None, SU=None, SV=None, bias=None,
        had_left=None, had_right=None, in_features=in_f, out_features=out_f,
        K_left=1, K_right=1, q_in=64, q_out=64)
    x = rng.standard_normal((2, 3, in_f)).astype(np.float32)
    y = qlinear.apply(p, jnp.asarray(x), compute_dtype=jnp.float32)
    assert y.shape == (2, 3, out_f)
