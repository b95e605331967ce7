"""u3 (3.125-bit E8P12) and pb (~6.5-bit RVQ4B) runtime layouts: encode
round-trips, dense-decode parity vs the nibble layout, fused-kernel parity
(interpret mode), and the layer/fusion integration paths.

The byte-cut rationale lives in ops/qtensor.py (e8p_u3_default,
rvq_pb_default); these tests pin the bit-level formats so a kernel or
packer change cannot silently corrupt weights.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

os.environ["QFA_PALLAS_INTERPRET"] = "1"

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.ops import dequant_pallas
from quip_for_all_tpu.ops.dequant_xla import decode_weights
from quip_for_all_tpu.ops.qtensor import (from_raw_idxs, pb_to_nibble,
                                          to_raw_idxs, u3_to_nibble)

E8P = get_codebook("E8P12")
RVQ4 = get_codebook("E8P12RVQ4B")


def _rand_e8p_idxs(rng, q_out, q_in):
    return rng.integers(0, 1 << 16, size=(q_out, q_in // 8),
                        dtype=np.uint16).astype(np.int64).astype(
                            np.uint32).view(np.int32)


def _rand_rvq4_idxs(rng, q_out, q_in):
    v = rng.integers(0, 1 << 62, size=(q_out, q_in // 8), dtype=np.uint64)
    return v.astype(np.uint32).view(np.int32)


# --------------------------------------------------------- round trips

@pytest.mark.fast
@pytest.mark.parametrize("shape", [(256, 512), (128, 1376 * 8)])
def test_u3_roundtrip_exact(rng, shape):
    q_out, q_in = shape[0], shape[1] if shape[1] % 8 == 0 else 512
    q_in = (q_in // 8) * 8
    raw = _rand_e8p_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(E8P, raw, q_out, q_in, layout="u3")
    assert qt.layout == "u3"
    back = to_raw_idxs(qt)
    assert np.array_equal(back, raw)


@pytest.mark.fast
@pytest.mark.parametrize("q_in", [512, 1376 * 8])
def test_pb_roundtrip_exact(rng, q_in):
    """ADVICE r4: pb pack/unpack pair must have CI coverage (the paired
    layout had it, pb did not)."""
    q_out = 128
    raw = _rand_rvq4_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(RVQ4, raw, q_out, q_in, layout="pb")
    assert qt.layout == "pb"
    back = to_raw_idxs(qt)
    assert np.array_equal(back, raw)


@pytest.mark.fast
def test_u3_to_nibble_random_planes(rng):
    """u3 -> nibble is exact at the (u, parity) level for ANY u in {0..7}
    (bench models use full-random planes, not valid codewords)."""
    from quip_for_all_tpu.ops.qtensor import (QuantizedTensor,
                                              u3_parity_lanes)
    q_out, q_in = 64, 1024
    Gp = 256
    planes = {
        "w0": jnp.asarray(rng.integers(-(1 << 31), 1 << 31,
                                       size=(q_out // 2, Gp),
                                       dtype=np.int64).astype(np.int32)),
        "w1": jnp.asarray(rng.integers(-(1 << 31), 1 << 31,
                                       size=(q_out // 2, Gp // 2),
                                       dtype=np.int64).astype(np.int32)),
        "w2": jnp.asarray(rng.integers(-(1 << 31), 1 << 31,
                                       size=(q_out // 2,
                                             u3_parity_lanes(Gp)),
                                       dtype=np.int64).astype(np.int32)),
    }
    qt = QuantizedTensor(planes, "E8P12", q_out, q_in, -1.0, layout="u3")
    nib = u3_to_nibble(qt)
    Wu = np.asarray(decode_weights(qt, dtype=jnp.float32))
    Wn = np.asarray(decode_weights(nib, dtype=jnp.float32))
    assert np.array_equal(Wu, Wn)


# --------------------------------------------------- dense decode parity

@pytest.mark.fast
def test_u3_dense_decode_matches_nibble(rng):
    q_out, q_in = 256, 4096
    raw = _rand_e8p_idxs(rng, q_out, q_in)
    qt_n = from_raw_idxs(E8P, raw, q_out, q_in, layout="nibble")
    qt_u = from_raw_idxs(E8P, raw, q_out, q_in, layout="u3")
    Wn = np.asarray(decode_weights(qt_n, dtype=jnp.float32))[:, :q_in]
    Wu = np.asarray(decode_weights(qt_u, dtype=jnp.float32))[:, :q_in]
    # same integers, exact float ops in both paths -> bitwise equal
    assert np.array_equal(Wn, Wu)


@pytest.mark.fast
def test_pb_dense_decode_matches_nibble(rng):
    q_out, q_in = 128, 2048
    raw = _rand_rvq4_idxs(rng, q_out, q_in)
    qt_n = from_raw_idxs(RVQ4, raw, q_out, q_in, layout="nibble")
    qt_p = from_raw_idxs(RVQ4, raw, q_out, q_in, layout="pb")
    Wn = np.asarray(decode_weights(qt_n, dtype=jnp.float32))[:, :q_in]
    Wp = np.asarray(decode_weights(qt_p, dtype=jnp.float32))[:, :q_in]
    rel = np.abs(Wn - Wp).max() / (np.abs(Wn).max() + 1e-9)
    assert rel < 1e-6, rel        # rs arithmetic orders differ slightly


# ------------------------------------------------- fused kernel parity

@pytest.mark.fast
@pytest.mark.parametrize("halfdots", ["0", "1"])
@pytest.mark.parametrize("shape", [(256, 512), (128, 1376 * 8), (384, 768)])
def test_u3_fused_matches_dense(rng, monkeypatch, halfdots, shape):
    monkeypatch.setenv("QFA_U3_HALFDOTS", halfdots)
    q_out, q_in = shape
    raw = _rand_e8p_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(E8P, raw, q_out, q_in, layout="u3")
    m = 3
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T
    out = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (halfdots, shape, rel)


@pytest.mark.fast
@pytest.mark.parametrize("shape", [(256, 512), (128, 1376 * 8)])
def test_pb_fused_matches_dense(rng, shape):
    q_out, q_in = shape
    raw = _rand_rvq4_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(RVQ4, raw, q_out, q_in, layout="pb")
    m = 3
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T
    out = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (shape, rel)


@pytest.mark.fast
def test_u3_fused_large_m_tiling(rng):
    """m > 32 exercises the 2-D (q_out-tile, m-tile) grid path."""
    q_out, q_in = 256, 512
    raw = _rand_e8p_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(E8P, raw, q_out, q_in, layout="u3")
    m = 64
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T
    out = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, rel


@pytest.mark.fast
def test_u3_fused_vjp(rng):
    """Gradients flow through the fused call (LoRA-over-frozen-base path):
    dx must match the dense-weight reference."""
    q_out, q_in = 256, 512
    raw = _rand_e8p_idxs(rng, q_out, q_in)
    qt = from_raw_idxs(E8P, raw, q_out, q_in, layout="u3")
    x = jnp.asarray(rng.standard_normal((4, q_in)).astype(np.float32))
    W = decode_weights(qt, dtype=jnp.float32)

    def f_fused(x):
        return jnp.sum(jnp.sin(dequant_pallas.fused_quant_matmul(x, qt)))

    def f_dense(x):
        return jnp.sum(jnp.sin(x @ W.T))

    gf = np.asarray(jax.grad(f_fused)(x))
    gd = np.asarray(jax.grad(f_dense)(x))
    rel = np.abs(gf - gd).max() / (np.abs(gd).max() + 1e-9)
    assert rel < 2e-4, rel


# ------------------------------------------------- layer + fusion paths

@pytest.mark.fast
def test_qlinear_apply_u3_matches_nibble(rng, monkeypatch):
    """Whole-layer forward (left/right transforms + SU/SV + kernel) with
    the u3 layout must match the nibble layout run."""
    from quip_for_all_tpu.nn import qlinear as QL
    from quip_for_all_tpu.utils.random_quantized import random_qlinear

    outs = {}
    for env, layout in (("0", "nibble"), ("1", "u3")):
        monkeypatch.setenv("QFA_E8P_U3", env)
        p = random_qlinear(E8P, 512, 384, np.random.default_rng(3))
        assert p.qweight.layout == layout
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (2, 512)).astype(np.float32))
        outs[layout] = np.asarray(QL.apply(p, x,
                                           compute_dtype=jnp.float32))
    # same seed -> same random planes? NO: layouts generate different
    # random bits. Compare through the dense path instead: each layout's
    # fused output must match ITS OWN dense-decoded reference.
    for env, layout in (("0", "nibble"), ("1", "u3")):
        monkeypatch.setenv("QFA_E8P_U3", env)
        p = random_qlinear(E8P, 512, 384, np.random.default_rng(3))
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (2, 512)).astype(np.float32))
        got = np.asarray(QL.apply(p, x, compute_dtype=jnp.float32))
        Wd = QL.calc_weight(p, dtype=jnp.float32)
        want = np.asarray(
            (x * p.SU.astype(x.dtype)) @ Wd.astype(jnp.float32))
        want = want[:, :p.out_features] * np.asarray(p.SV)[None, :]
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 5e-5, (layout, rel)


@pytest.mark.fast
def test_fused_group_u3(rng, monkeypatch):
    """qkv-style FusedQuantLinear over u3 tensors (row-pair planes concat
    on axis 0) matches per-layer application."""
    monkeypatch.setenv("QFA_E8P_U3", "1")
    from quip_for_all_tpu.nn import qlinear as QL
    from quip_for_all_tpu.transforms.incoherence import get_hadK
    from quip_for_all_tpu.utils.random_quantized import random_qlinear

    rngs = np.random.default_rng(11)
    spec = get_hadK(512, use_rand=True, rng=rngs)
    SU = np.sign(rngs.standard_normal(512)).astype(np.float32)
    ps = [random_qlinear(E8P, 512, 256, rngs, lspec=spec, SU=SU)
          for _ in range(3)]
    ps = [p for p in ps]
    # share the SAME SU/had objects (fuse precondition)
    import dataclasses
    ps = [dataclasses.replace(p, SU=ps[0].SU, had_left=ps[0].had_left)
          for p in ps]
    f = QL.fuse_qlinears(ps)
    x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    fused = [np.asarray(o) for o in
             QL.fused_apply(f, x, compute_dtype=jnp.float32)]
    for p, got in zip(ps, fused):
        want = np.asarray(QL.apply(p, x, compute_dtype=jnp.float32))
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 5e-5, rel
