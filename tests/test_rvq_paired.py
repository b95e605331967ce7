"""Paired ~6.5-bit RVQ4B runtime layout (ops/qtensor.py module docstring).

The nibble layout spends 8 bits/weight on E8P12RVQ4B's two E8P stages; the
paired layout packs (u0, u1) codes plus per-group parity into ~6.5 bits,
cutting the DMA-bound fused kernel's HBM traffic ~19%. These tests pin:
exact code roundtrip, decode parity vs the nibble layout, the fused kernel
against the dense decode, checkpoint interop, and the QuantLinear /
MoE-stacking integration.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.codebooks import get_codebook
from quip_for_all_tpu.ops import dequant_pallas
from quip_for_all_tpu.ops.dequant_xla import decode_weights
from quip_for_all_tpu.ops.qtensor import (from_checkpoint_idxs,
                                          from_raw_idxs, paired_wp,
                                          to_checkpoint_idxs, to_raw_idxs)

CB = get_codebook("E8P12RVQ4B")


def _raw(rng, q_out, q_in):
    return (rng.integers(0, 1 << 32, size=(q_out, q_in // 8),
                         dtype=np.uint64).astype(np.uint32).view(np.int32))


@pytest.mark.parametrize("shape", [(128, 512), (128, 1376), (256, 2048)])
def test_roundtrip_exact(rng, shape):
    q_out, q_in = shape
    raw = _raw(rng, q_out, q_in)
    qt = from_raw_idxs(CB, raw, q_out, q_in, layout="paired")
    assert qt.layout == "paired"
    assert np.array_equal(to_raw_idxs(qt), raw)


def test_plane_geometry(rng):
    qt = from_raw_idxs(CB, _raw(rng, 128, 4096), 128, 4096,
                       layout="paired")
    Gp = qt.planes["w0"].shape[1]
    assert Gp % 256 == 0
    assert qt.planes["w1"].shape[1] == Gp // 2
    assert qt.planes["w2"].shape[1] == paired_wp(Gp)
    # stored density: (Gp + Gp/2 + Wp) * 32 bits over Gp*8 weights
    bits = (Gp + Gp // 2 + paired_wp(Gp)) * 32 / (Gp * 8)
    assert bits <= 7.0, bits   # vs the nibble layout's 8


def test_dense_decode_matches_nibble(rng):
    q_out, q_in = 128, 1376
    raw = _raw(rng, q_out, q_in)
    Wn = decode_weights(from_raw_idxs(CB, raw, q_out, q_in,
                                      layout="nibble"), dtype=jnp.float32)
    Wp = decode_weights(from_raw_idxs(CB, raw, q_out, q_in,
                                      layout="paired"), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(Wn), np.asarray(Wp),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("m", [1, 3, 33, 64])
def test_fused_matches_dense(rng, m):
    q_out, q_in = 256, 512
    raw = _raw(rng, q_out, q_in)
    qt = from_raw_idxs(CB, raw, q_out, q_in, layout="paired")
    x = rng.standard_normal((m, q_in)).astype(np.float32)
    ref = x @ np.asarray(decode_weights(qt, dtype=jnp.float32)).T
    out = np.asarray(dequant_pallas.fused_quant_matmul(jnp.asarray(x), qt))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 2e-5, rel


def test_checkpoint_roundtrip(rng):
    """Checkpoint Qidxs (reference schema) survive a paired-layout load."""
    q_out, q_in = 128, 512
    raw = _raw(rng, q_out, q_in)
    qt = from_raw_idxs(CB, raw, q_out, q_in, layout="paired")
    ck = to_checkpoint_idxs(qt)
    qt2 = from_checkpoint_idxs(CB, ck, q_out, q_in)
    assert np.array_equal(to_raw_idxs(qt2), raw)


def test_qlinear_apply_parity(rng):
    """Full QuantLinear forward: paired vs nibble layouts agree (both
    round the decoded weight to bf16 on their respective paths)."""
    from quip_for_all_tpu.utils.random_quantized import random_qlinear
    import os
    for env, layouts in (("1", "paired"), ("0", "nibble"), (None, "nibble")):
        if env is None:
            os.environ.pop("QFA_RVQ_PAIRED", None)
        else:
            os.environ["QFA_RVQ_PAIRED"] = env
        try:
            p = random_qlinear(CB, 512, 384, np.random.default_rng(7))
            assert p.qweight.layout == layouts
        finally:
            os.environ.pop("QFA_RVQ_PAIRED", None)
    raw = _raw(rng, 384, 512)
    from quip_for_all_tpu.nn import qlinear as QL
    base = random_qlinear(CB, 512, 384, np.random.default_rng(7))
    qt_n = from_raw_idxs(CB, raw, base.q_out, base.q_in, layout="nibble")
    qt_p = from_raw_idxs(CB, raw, base.q_out, base.q_in, layout="paired")
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    out_n = QL.apply(dataclasses.replace(base, qweight=qt_n), x)
    out_p = QL.apply(dataclasses.replace(base, qweight=qt_p), x)
    np.testing.assert_allclose(np.asarray(out_n, np.float32),
                               np.asarray(out_p, np.float32),
                               rtol=0.05, atol=0.05)


def test_moe_stack_converts_to_nibble(rng):
    """stack_qlinears re-encodes paired experts to the nibble layout the
    sparse MoE kernel decodes; the stacked forward stays correct."""
    from quip_for_all_tpu.nn.qmoe import stack_qlinears, unstack_qlinear
    from quip_for_all_tpu.utils.random_quantized import random_qlinear
    from quip_for_all_tpu.transforms.incoherence import get_hadK
    import os
    rngs = np.random.default_rng(3)
    os.environ["QFA_RVQ_PAIRED"] = "1"
    try:
        groups = []
        for _ in range(2):  # 2 experts x 2 segments sharing left
            spec = get_hadK(512, use_rand=True, rng=rngs)
            su = np.sign(rngs.standard_normal(512)).astype(np.float32)
            # device-random planes need not be valid codewords — the
            # u-level conversion (paired_to_nibble) must handle them,
            # because bench mixtral models are exactly this
            groups.append([random_qlinear(CB, 512, 256, rngs,
                                          lspec=spec, SU=su)
                           for _ in range(2)])
        assert groups[0][0].qweight.layout == "paired"
        sq = stack_qlinears(groups)
        assert sq is not None
        back = unstack_qlinear(sq, 0)
        assert back[0].qweight.layout == "nibble"
        Wp = decode_weights(groups[0][0].qweight, dtype=jnp.float32)
        Wn = decode_weights(back[0].qweight, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(Wp), np.asarray(Wn),
                                   rtol=0, atol=1e-5)
    finally:
        os.environ.pop("QFA_RVQ_PAIRED", None)
