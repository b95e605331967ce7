"""LDLQ + per-layer quantization tests: oracle vs the reference LDLQ
(torch CPU), proxy-loss sanity, and the end-to-end identity
apply(pack(quantize_layer(W, H))) ≈ x @ W_hat^T (SURVEY.md §4)."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.nn import qlinear
from quip_for_all_tpu.quantize.hessian import HessianState, accumulate, \
    finalize
from quip_for_all_tpu.quantize.ldlq import block_ldl, ldlq
from quip_for_all_tpu.quantize.quip import (
    QuantConfig, pack_to_qlinear, quantize_layer)

REF = "/root/reference"
HAS_REF = os.path.isfile(os.path.join(REF, "quant.py"))


def _rand_H(rng, n, strength=4.0):
    X = rng.standard_normal((8 * n, n)).astype(np.float64)
    # correlated activations
    mix = np.eye(n) + strength / n * rng.standard_normal((n, n))
    X = X @ mix
    H = X.T @ X / X.shape[0]
    return H.astype(np.float32)


def test_block_ldl_reconstruction(rng):
    n, g = 32, 4
    H = _rand_H(rng, n) + 0.1 * np.eye(n, dtype=np.float32)
    L_chol = np.linalg.cholesky(H.astype(np.float64))
    L = np.asarray(block_ldl(jnp.asarray(L_chol.astype(np.float32)), g))
    # unit diagonal blocks, block-lower-triangular
    for i in range(n // g):
        blk = L[i * g:(i + 1) * g, i * g:(i + 1) * g]
        assert np.allclose(blk, np.eye(g), atol=1e-4)
        assert np.allclose(L[: i * g, i * g:(i + 1) * g], 0, atol=1e-5)
    # L D L^T = H where D_i = chol_diag_i chol_diag_i^T
    D = np.zeros_like(L)
    for i in range(n // g):
        d = L_chol[i * g:(i + 1) * g, i * g:(i + 1) * g]
        D[i * g:(i + 1) * g, i * g:(i + 1) * g] = d @ d.T
    assert np.allclose(L @ D @ L.T, H, atol=1e-3)


def test_ldlq_beats_direct_rounding(rng):
    cb = get_codebook("D4")
    m, n = 24, 64
    W = rng.standard_normal((m, n)).astype(np.float32)
    H = _rand_H(rng, n) + 0.01 * np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(H.astype(np.float64)).astype(np.float32)
    hatW, _ = ldlq(jnp.asarray(W), jnp.asarray(H), jnp.asarray(L), cb, 0)
    hatW = np.asarray(hatW)
    # proxy loss tr((W-hatW) H (W-hatW)^T)
    def proxy(A):
        E = W - A
        return float(np.trace(E @ H @ E.T))
    direct, _ = cb.quantize(jnp.asarray(W.reshape(-1, 4)))
    direct = np.asarray(direct).reshape(m, n)
    assert proxy(hatW) < proxy(direct) * 0.9


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("tune_iters", [0, 2])
def test_ldlq_oracle_d4(tune_iters, rng):
    """Bit-parity with reference LDLQ (quant.py:106-135) on D4."""
    import torch
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(REF)
    try:
        import quant as ref_quant
        from codebook.d4 import D4_codebook
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    cb = get_codebook("D4")
    ref_cb = D4_codebook()
    m, n = 16, 32
    W = rng.standard_normal((m, n)).astype(np.float32)
    H = _rand_H(rng, n) + 0.05 * np.eye(n, dtype=np.float32)
    L = np.linalg.cholesky(H.astype(np.float64)).astype(np.float32)

    ref_hat, ref_idx = ref_quant.LDLQ(
        torch.from_numpy(W.copy()), torch.from_numpy(H.copy()),
        torch.from_numpy(L.copy()), ref_cb, tune_iters)
    hatW, Qidxs = ldlq(jnp.asarray(W), jnp.asarray(H), jnp.asarray(L), cb,
                       tune_iters)
    assert np.allclose(np.asarray(hatW), ref_hat.numpy(), atol=1e-4)
    assert np.array_equal(np.asarray(Qidxs),
                          ref_idx.numpy().astype(np.int32))


def test_hessian_accumulation(rng):
    n = 16
    st = HessianState.zeros(n)
    chunks = [rng.standard_normal((7, n)).astype(np.float32)
              for _ in range(5)]
    for c in chunks:
        st = accumulate(st, jnp.asarray(c))
    H = np.asarray(finalize(st))
    X = np.concatenate(chunks, axis=0)
    assert np.allclose(H, X.T @ X / X.shape[0], atol=1e-5)


@pytest.mark.parametrize("name,per_channel",
                         [("D4", False), ("E8P12", False), ("E8P12", True),
                          ("E8P12RVQ4B", False), ("HI", False)])
def test_quantize_layer_end_to_end(name, per_channel, rng):
    cb = get_codebook(name)
    n_out, n_in = 32, 64
    W = rng.standard_normal((n_out, n_in)).astype(np.float32) * 0.3
    H = _rand_H(rng, n_in, strength=1.0)
    cfg = QuantConfig(per_channel=per_channel, quip_tune_iters=1)
    attrs, W_hat = quantize_layer(W, H, cb, cfg, rng)
    # 1) reconstruction is a sane approximation
    rel = np.linalg.norm(W - W_hat) / np.linalg.norm(W)
    max_rel = {"D4": 0.55, "E8P12": 0.45, "E8P12RVQ4B": 0.2, "HI": 0.25}
    assert rel < max_rel[name], rel
    # 2) the packed runtime layer reproduces x @ W_hat^T
    bias = rng.standard_normal(n_out).astype(np.float32)
    p = pack_to_qlinear(attrs, cb, bias=bias, per_channel=per_channel)
    x = rng.standard_normal((4, n_in)).astype(np.float32)
    y = np.asarray(qlinear.apply(p, jnp.asarray(x),
                                 compute_dtype=jnp.float32))
    y_ref = x @ W_hat.T + bias
    assert np.allclose(y, y_ref, rtol=5e-3, atol=5e-3), \
        np.abs(y - y_ref).max()
    # 3) training path agrees as well
    y_tr = np.asarray(qlinear.apply(p, jnp.asarray(x), training=True))
    assert np.allclose(y_tr, y_ref, rtol=5e-3, atol=5e-3)


def test_quantize_layer_rescale_WH(rng):
    cb = get_codebook("D4")
    W = rng.standard_normal((16, 32)).astype(np.float32)
    H = _rand_H(rng, 32, strength=1.0)
    cfg = QuantConfig(rescale_WH=True, quip_tune_iters=0)
    attrs, W_hat = quantize_layer(W, H, cb, cfg, rng)
    assert attrs.scaleWH is not None
    p = pack_to_qlinear(attrs, cb)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    y = np.asarray(qlinear.apply(p, jnp.asarray(x),
                                 compute_dtype=jnp.float32))
    assert np.allclose(y, x @ W_hat.T, rtol=1e-2, atol=1e-2)
