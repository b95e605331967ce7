"""Fused Pallas dequant-matmul correctness vs the XLA decode path
(interpret mode on CPU; real-hardware timing lives in
tools/microbench_decode.py)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

os.environ["QFA_PALLAS_INTERPRET"] = "1"

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.ops import dequant_pallas
from quip_for_all_tpu.ops.dequant_xla import decode_weights
from quip_for_all_tpu.ops.qtensor import from_raw_idxs


def _n_codes(cb):
    return {"D4": 256, "E8P12": 1 << 16, "HI": 16,
            "E8P12RVQ3B": 1 << 24, "E8P12RVQ4B": 1 << 32}[cb.id]


@pytest.mark.parametrize("name", ["E8P12", "D4", "HI", "E8P12RVQ3B",
                                  "E8P12RVQ4B"])
@pytest.mark.parametrize("strategy", ["A", "B"])
@pytest.mark.parametrize("shape", [(256, 512), (128, 1376 * 8 // 8)])
def test_fused_matches_xla(name, strategy, shape, rng, monkeypatch):
    monkeypatch.setenv("QFA_DECODE_STRATEGY", strategy)
    cb = get_codebook(name)
    q_out, q_in = shape
    q_in = (q_in // cb.codesz) * cb.codesz
    if name == "HI":
        q_in = (q_in // 8) * 8
    vals = rng.integers(0, min(_n_codes(cb), 1 << 62),
                        size=(q_out, q_in // cb.codesz), dtype=np.uint64)
    raw = vals.astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in)

    m = 3
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T

    out = np.asarray(dequant_pallas.fused_quant_matmul(
        jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (name, strategy, shape, rel)


def test_forced_pallas_on_unsupported_shape_raises():
    """impl='pallas' on a shape the kernel can't tile (q_out < 128) must
    raise, not silently produce an uninitialized output."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from quip_for_all_tpu.codebooks import get_codebook
    from quip_for_all_tpu.ops.qtensor import from_raw_idxs
    from quip_for_all_tpu.ops.quant_matmul import quant_matmul

    cb = get_codebook("E8P12")
    idxs = np.zeros((64, 8), dtype=np.int32)
    qt = from_raw_idxs(cb, idxs, 64, 64)
    x = jnp.ones((4, 64), jnp.float32)
    with pytest.raises(AssertionError):
        quant_matmul(x, qt, impl="pallas")


@pytest.mark.parametrize("m", [8, 33, 48, 96, 256])
def test_fused_m_tiled_grid_matches_xla(m, rng):
    """m > 32 engages the 2-D m-tiled grid (accumulator stays in vector
    registers); every m must match the dense decode exactly."""
    cb = get_codebook("E8P12")
    q_out, q_in = 256, 512
    raw = rng.integers(0, 1 << 16, size=(q_out, q_in // 8),
                       dtype=np.int64).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in)
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T
    out = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (m, rel)


@pytest.mark.parametrize("m", [8, 48])
def test_fused_scale_vec_m_tiled(m, rng):
    """scale_vec epilogue under both the 1-D and m-tiled grids."""
    cb = get_codebook("E8P12")
    q_out, q_in = 256, 512
    raw = rng.integers(0, 1 << 16, size=(q_out, q_in // 8),
                       dtype=np.int64).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in)
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    sv = rng.standard_normal(q_out).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = (x @ W.T) * sv[None, :]
    G = q_in // 8
    Gp = qt.group_cols
    xg = x.reshape(m, G, 8).transpose(0, 2, 1)          # (m, 8, G)
    xg = np.pad(xg, ((0, 0), (0, 0), (0, Gp - G))).reshape(m, 8 * Gp)
    out = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        jnp.asarray(xg), qt, scale_vec=jnp.asarray(sv)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (m, rel)


def test_fused_custom_vjp_matches_dense_grad(rng):
    """Gradients THROUGH the fused kernel (custom VJP, dense-decode
    backward) must match autodiff through the dense reference — the LoRA
    training path takes grads through frozen quantized base layers."""
    cb = get_codebook("E8P12")
    q_out, q_in = 256, 512
    raw = rng.integers(0, 1 << 16, size=(q_out, q_in // 8),
                       dtype=np.int64).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    x = jnp.asarray(rng.standard_normal((5, q_in)), jnp.float32)
    g_out = jnp.asarray(rng.standard_normal((5, q_out)), jnp.float32)

    def f_fused(x):
        return (dequant_pallas.fused_quant_matmul(x, qt) * g_out).sum()

    def f_dense(x):
        return ((x @ jnp.asarray(W).T) * g_out).sum()

    gf = np.asarray(jax.grad(f_fused)(x))
    gd = np.asarray(jax.grad(f_dense)(x))
    np.testing.assert_allclose(gf, gd, rtol=1e-4, atol=1e-4)

    # with scale_vec + right_hb epilogues
    from quip_for_all_tpu.transforms.incoherence import (HadSpec,
                                                         finish_right,
                                                         right_b_factor)
    sv = jnp.asarray(rng.standard_normal(q_out), jnp.float32)
    spec = HadSpec(None, 1, q_out)
    hb, B = right_b_factor(spec)
    G, Gp = q_in // 8, qt.group_cols

    def pre(x):
        xg = x.reshape(-1, G, 8).transpose(0, 2, 1)
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, Gp - G)))
        return xg.reshape(x.shape[0], 8 * Gp)

    def f_fused2(x, sv):
        y = dequant_pallas.fused_quant_matmul_pre(
            pre(x), qt, scale_vec=sv, right_hb=jnp.asarray(hb, jnp.float32))
        return (finish_right(y, spec) * g_out).sum()

    def f_dense2(x, sv):
        y = (x @ jnp.asarray(W).T) * sv[None, :]
        Yr = y.reshape(-1, q_out // B, B) @ jnp.asarray(hb.T, jnp.float32)
        return (finish_right(Yr.reshape(-1, q_out), spec) * g_out).sum()

    for argnum in (0, 1):
        gf = np.asarray(jax.grad(f_fused2, argnums=argnum)(x, sv))
        gd = np.asarray(jax.grad(f_dense2, argnums=argnum)(x, sv))
        np.testing.assert_allclose(gf, gd, rtol=1e-4, atol=1e-4,
                                   err_msg=f"argnum {argnum}")


@pytest.mark.parametrize("name", ["E8P12", "E8P12RVQ4B"])
@pytest.mark.parametrize("ksplit", ["2", "4"])
def test_fused_ksplit_matches_base(name, ksplit, rng, monkeypatch):
    """QFA_KSPLIT chunked-accumulator pipeline must reproduce the base
    kernel (including scale_vec epilogue) — requested chunk counts that
    don't divide Gp/128 fall back to the nearest divisor."""
    cb = get_codebook(name)
    q_out, q_in = 256, 2048                 # Gp = 256 -> 2 lane blocks
    n = _n_codes(cb)
    vals = rng.integers(0, min(n, 1 << 62), size=(q_out, q_in // cb.codesz),
                        dtype=np.uint64)
    qt = from_raw_idxs(cb, vals.astype(np.uint32).view(np.int32),
                       q_out, q_in, layout="nibble")
    m = 3
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    sv = rng.standard_normal(q_out).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = (x @ W.T) * sv[None, :]

    G, Gp = q_in // 8, qt.group_cols
    xg = x.reshape(m, G, 8).transpose(0, 2, 1)
    xg = np.pad(xg, ((0, 0), (0, 0), (0, Gp - G))).reshape(m, 8 * Gp)

    monkeypatch.setenv("QFA_KSPLIT", ksplit)
    out = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        jnp.asarray(xg), qt, scale_vec=jnp.asarray(sv)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (name, ksplit, rel)

    # plain path (no scale_vec), exercising fused_quant_matmul end to end
    out2 = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    ref2 = x @ W.T
    rel2 = np.abs(out2 - ref2).max() / (np.abs(ref2).max() + 1e-9)
    assert rel2 < 2e-5, (name, ksplit, rel2)


def test_fused_forced_tn_variant(rng, monkeypatch):
    """QFA_TN rides the variant tuple: flipping it between calls must
    recompile (not reuse a stale executable) and match the dense path."""
    cb = get_codebook("E8P12")
    q_out, q_in = 512, 512
    raw = rng.integers(0, 1 << 16, size=(q_out, q_in // 8),
                       dtype=np.int64).astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in)
    x = rng.standard_normal((3, q_in)).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = x @ W.T
    for tn in ("128", "256", "512"):
        monkeypatch.setenv("QFA_TN", tn)
        out = np.asarray(dequant_pallas.fused_quant_matmul(
            jnp.asarray(x), qt))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-5, (tn, rel)


@pytest.mark.parametrize("name", ["E8P12RVQ4B", "E8P12RVQ3B"])
def test_fused_combine_planes_matches_base(name, rng, monkeypatch):
    """QFA_COMBINE_PLANES pre-adds the residual stage's value plane in f32
    (v = n0 + (alpha1/alpha0)*n1) and halves the dot sweep; must match the
    dense decode within f32 tolerance (the dot runs at HIGHEST precision
    because the combined plane is fractional) including the scale_vec
    epilogue."""
    cb = get_codebook(name)
    q_out, q_in = 256, 1024
    n = _n_codes(cb)
    vals = rng.integers(0, min(n, 1 << 62), size=(q_out, q_in // cb.codesz),
                        dtype=np.uint64)
    qt = from_raw_idxs(cb, vals.astype(np.uint32).view(np.int32),
                       q_out, q_in, layout="nibble")
    m = 3
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    sv = rng.standard_normal(q_out).astype(np.float32)
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    ref = (x @ W.T) * sv[None, :]

    G, Gp = q_in // 8, qt.group_cols
    xg = x.reshape(m, G, 8).transpose(0, 2, 1)
    xg = np.pad(xg, ((0, 0), (0, 0), (0, Gp - G))).reshape(m, 8 * Gp)

    monkeypatch.setenv("QFA_COMBINE_PLANES", "8")
    out = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        jnp.asarray(xg), qt, scale_vec=jnp.asarray(sv)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (name, rel)

    # m above the combine threshold falls back to the split form
    monkeypatch.setenv("QFA_COMBINE_PLANES", "2")
    out2 = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    ref2 = x @ W.T
    rel2 = np.abs(out2 - ref2).max() / (np.abs(ref2).max() + 1e-9)
    assert rel2 < 2e-5, (name, rel2)


@pytest.mark.parametrize("name", ["E8P12", "E8P12RVQ4B", "D4", "HI"])
@pytest.mark.parametrize("P", [2, 4])
def test_subword_layout_matches_base(name, P, rng, monkeypatch):
    """sw2/sw4 runtime layouts (int16/int8 subword planes + matching x
    lane layout from matmul_hadUt_grouped(split=P)) must reproduce the
    dense decode, round-trip exactly to raw idxs, and carry gradients."""
    from quip_for_all_tpu.ops.qtensor import (from_subword, to_raw_idxs,
                                              to_subword)
    from quip_for_all_tpu.transforms.incoherence import (
        get_hadK, matmul_hadUt, matmul_hadUt_grouped)
    cb = get_codebook(name)
    q_out, q_in = 256, 1024
    n = _n_codes(cb)
    vals = rng.integers(0, min(n, 1 << 62), size=(q_out, q_in // cb.codesz),
                        dtype=np.uint64)
    raw = vals.astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in, layout="nibble")
    qs = to_subword(qt, P)
    # exact storage round-trips
    back = from_subword(qs)
    for k in qt.planes:
        assert np.array_equal(np.asarray(back.planes[k]),
                              np.asarray(qt.planes[k]))
    assert np.array_equal(to_raw_idxs(qs), to_raw_idxs(qt))
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    assert np.array_equal(np.asarray(decode_weights(qs, jnp.float32)), W)
    # kernel through the grouped prologue with fused scale_vec
    x = rng.standard_normal((3, q_in)).astype(np.float32)
    sv = rng.standard_normal(q_out).astype(np.float32)
    spec = get_hadK(q_in, use_rand=True, rng=np.random.default_rng(5))
    xt = np.asarray(matmul_hadUt(jnp.asarray(x), spec, scale=1.3))
    ref = (xt @ W.T) * sv[None, :]
    xg = matmul_hadUt_grouped(jnp.asarray(x), spec, qs.group_cols,
                              scale=1.3, split=P)
    out = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        xg, qs, scale_vec=jnp.asarray(sv)))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-5, (name, P, rel)
    # gradient through the sw kernel (custom VJP, split-aware layout)
    g = jax.grad(lambda xx: dequant_pallas.fused_quant_matmul_pre(
        xx, qs, scale_vec=jnp.asarray(sv)).sum())(xg)
    gd = np.asarray(jax.grad(
        lambda xx: ((xx @ W.T) * sv[None, :]).sum())(jnp.asarray(xt)))
    G, nq = q_in // 8, 8 // P
    gd_s = gd.reshape(3, G, P, nq).transpose(0, 3, 1, 2).reshape(3, 8 * G)
    grel = np.abs(np.asarray(g) - gd_s).max() / (np.abs(gd_s).max() + 1e-9)
    assert grel < 1e-4, (name, P, grel)


@pytest.mark.parametrize("name", ["E8P12", "D4", "HI", "E8P12RVQ3B",
                                  "E8P12RVQ4B"])
def test_bfp_layout_matches_base(name, rng):
    """The bf16 lane-magic layout (ops/qtensor.py bfp_default — opt-in,
    falsified as a speed win) must reproduce the dense decode, round-trip
    exactly to raw idxs, run the fused kernel through the grouped prologue
    with scale_vec + right_hb epilogues, and carry gradients."""
    from quip_for_all_tpu.ops.qtensor import (from_bfp, to_bfp,
                                              to_raw_idxs)
    from quip_for_all_tpu.transforms.incoherence import (
        HadSpec, finish_right, get_hadK, matmul_hadUt,
        matmul_hadUt_grouped, right_b_factor)
    cb = get_codebook(name)
    q_out, q_in = 256, 1024
    n = _n_codes(cb)
    vals = rng.integers(0, min(n, 1 << 62), size=(q_out, q_in // cb.codesz),
                        dtype=np.uint64)
    raw = vals.astype(np.uint32).view(np.int32)
    qt = from_raw_idxs(cb, raw, q_out, q_in, layout="nibble")
    qb = to_bfp(qt)
    assert qb.planes["w0"].shape == (2, q_out // 2, qt.group_cols)
    # exact storage round-trips
    back = from_bfp(qb)
    for k in qt.planes:
        assert np.array_equal(np.asarray(back.planes[k]),
                              np.asarray(qt.planes[k]))
    assert np.array_equal(to_raw_idxs(qb), to_raw_idxs(qt))
    W = np.asarray(decode_weights(qt, dtype=jnp.float32))
    assert np.array_equal(np.asarray(decode_weights(qb, jnp.float32)), W)
    # kernel through the grouped prologue with fused epilogues
    x = rng.standard_normal((3, q_in)).astype(np.float32)
    sv = rng.standard_normal(q_out).astype(np.float32)
    spec = get_hadK(q_in, use_rand=True, rng=np.random.default_rng(5))
    rspec = HadSpec(None, 1, q_out)
    hb, B = right_b_factor(rspec)
    xt = np.asarray(matmul_hadUt(jnp.asarray(x), spec, scale=1.3))
    yref = (xt @ W.T) * sv[None, :]
    yref = (yref.reshape(-1, q_out // B, B) @ np.asarray(hb).T
            ).reshape(-1, q_out)
    xg = matmul_hadUt_grouped(jnp.asarray(x), spec, qb.group_cols,
                              scale=1.3)
    out = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        xg, qb, scale_vec=jnp.asarray(sv),
        right_hb=jnp.asarray(hb, jnp.float32)))
    rel = np.abs(out - yref).max() / (np.abs(yref).max() + 1e-9)
    assert rel < 2e-5, (name, rel)
    # m-tiled grid path (m > 32)
    xm = rng.standard_normal((64, q_in)).astype(np.float32)
    G = q_in // 8
    xmg = xm.reshape(64, G, 8).transpose(0, 2, 1)
    xmg = np.pad(xmg, ((0, 0), (0, 0), (0, qb.group_cols - G))
                 ).reshape(64, 8 * qb.group_cols)
    om = np.asarray(dequant_pallas.fused_quant_matmul_pre(
        jnp.asarray(xmg), qb))
    rm = xm @ W.T
    relm = np.abs(om - rm).max() / (np.abs(rm).max() + 1e-9)
    assert relm < 2e-5, (name, relm)
    # gradient through the bfp kernel (custom VJP decodes bfp planes)
    g = jax.grad(lambda xx: dequant_pallas.fused_quant_matmul_pre(
        xx, qb, scale_vec=jnp.asarray(sv)).sum())(xg)
    gd = np.asarray(jax.grad(
        lambda xx: ((xx @ W.T) * sv[None, :]).sum())(jnp.asarray(xt)))
    gd_g = gd.reshape(3, G, 8).transpose(0, 2, 1)
    gd_g = np.pad(gd_g, ((0, 0), (0, 0), (0, qb.group_cols - G))
                  ).reshape(3, 8 * qb.group_cols)
    grel = np.abs(np.asarray(g) - gd_g).max() / (np.abs(gd_g).max() + 1e-9)
    assert grel < 1e-4, (name, grel)
