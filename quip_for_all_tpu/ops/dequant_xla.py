"""Pure-XLA codebook decode (dequantize to dense) from affine nibble word
planes — replaces the reference's CUDA decompress kernels (N2,
``quip_cuda/origin_order.cu:794-1074``).

Used for prefill / large-m matmuls (decode once, then one big MXU matmul)
and the training path's dense weight materialization (``qlinear.py:144-159``).
Decode is shifts/masks/converts plus one affine map per plane set (see
ops/qtensor.py for the word format) — no gathers, so XLA fuses it well on
both CPU and TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .qtensor import QuantizedTensor


def _u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _nibble_planes(w_i32):
    """int32 word plane (..., G) -> list of 8 (..., G) f32 nibble planes."""
    w = _u32(w_i32)
    out = []
    for i in range(8):
        nib = w >> (4 * i) if i == 7 else (w >> (4 * i)) & 0xF
        out.append(nib.astype(jnp.float32))
    return out


def _paired_positions(qt: QuantizedTensor, dtype):
    """Paired RVQ4B layout (ops/qtensor.py module docstring): per weight
    value = u0 + rs*u1 - 2.25*(1+rs) - 0.5*(p0 + rs*p1)[group]."""
    rs = qt.opt_resid_scale
    L = _u32(qt.planes["w0"])
    Hw = _u32(qt.planes["w1"])
    Pw = _u32(qt.planes["w2"])
    Gp, Wp = L.shape[-1], Pw.shape[-1]
    Gh = Gp // 2
    delta = jnp.concatenate(
        [((Pw >> (2 * j)) & 1).astype(jnp.float32)
         + rs * ((Pw >> (2 * j + 1)) & 1).astype(jnp.float32)
         for j in range(Gp // Wp)], axis=-1)          # (q_out, Gp)
    const = -2.25 * (1.0 + rs) - 0.5 * delta
    out = []
    for i in range(8):
        lo4 = (L >> (4 * i)) & 0xF
        b = (lo4 >> 3).astype(jnp.float32)
        u0 = (lo4 & 7).astype(jnp.float32)
        hi = jnp.concatenate(
            [((Hw >> (16 * h + 2 * i)) & 3).astype(jnp.float32)
             for h in (0, 1)], axis=-1)               # (q_out, Gp)
        v = u0 + rs * (2.0 * hi + b) + const
        out.append(v.astype(dtype))
    return out


def _unpair16(w_i32):
    """(q_out/2, C) row-pair words -> (q_out, C) 16-bit payloads."""
    w = _u32(w_i32)
    return jnp.stack([w & 0xFFFF, w >> 16], axis=1).reshape(
        -1, w.shape[-1]).astype(jnp.int32)


def _u3_positions(qt: QuantizedTensor, dtype):
    """u3 layout (ops/qtensor.py e8p_u3_default): weight = u - 2.25 -
    0.5*p with u = (lo 2-bit) + 4*(hi 1-bit), parity per group."""
    L16 = _unpair16(qt.planes["w0"])            # (q_out, Gp)
    H16 = _unpair16(qt.planes["w1"])            # (q_out, Gp/2)
    P16 = _unpair16(qt.planes["w2"])            # (q_out, PL)
    Gp, PL = L16.shape[-1], P16.shape[-1]
    par = jnp.concatenate(
        [((P16 >> j) & 1) for j in range(Gp // PL)], axis=-1)[:, :Gp]
    const = -2.25 - 0.5 * par.astype(jnp.float32)
    out = []
    for i in range(8):
        lo = ((L16 >> (2 * i)) & 3).astype(jnp.float32)
        hi = jnp.concatenate(
            [((H16 >> (8 * d + i)) & 1) for d in (0, 1)],
            axis=-1).astype(jnp.float32)
        out.append((lo + 4.0 * hi + const).astype(dtype))
    return out


def _pb_positions(qt: QuantizedTensor, dtype):
    """pb layout (ops/qtensor.py rvq_pb_default): per weight value =
    u0 + rs*u1 - 2.25*(1+rs) - 0.5*(p0 + rs*p1)[group]; w0 is the
    bfp-style lo4 plane pair (halves = positions 0-3 / 4-7)."""
    rs = qt.opt_resid_scale
    w0 = _u32(qt.planes["w0"])                  # (2, q_out/2, Gp)
    A16 = [_unpair16(w0[h]) for h in (0, 1)]    # positions 0-3, 4-7
    H16 = _unpair16(qt.planes["w1"])            # (q_out, Gp) 2-bit fields
    P16 = _unpair16(qt.planes["w2"])            # (q_out, PL) 2-bit pairs
    Gp, PL = H16.shape[-1], P16.shape[-1]
    pcat = jnp.concatenate(
        [((P16 >> (2 * j)) & 3) for j in range(-(-Gp // PL))],
        axis=-1)[:, :Gp]
    p0 = (pcat & 1).astype(jnp.float32)
    p1 = (pcat >> 1).astype(jnp.float32)
    const = -2.25 * (1.0 + rs) - 0.5 * (p0 + rs * p1)
    out = []
    for i in range(8):
        lo4 = (A16[i // 4] >> (4 * (i % 4))) & 0xF
        b = (lo4 >> 3).astype(jnp.float32)
        u0 = (lo4 & 7).astype(jnp.float32)
        hi = ((H16 >> (2 * i)) & 3).astype(jnp.float32)
        v = u0 + rs * (2.0 * hi + b) + const
        out.append(v.astype(dtype))
    return out


def decode_positions(qt: QuantizedTensor, dtype=jnp.float32):
    """-> list of 8 (q_out, G_padded) planes; plane i holds weight 8g+i."""
    if qt.layout == "paired":
        return _paired_positions(qt, dtype)
    if qt.layout == "u3":
        return _u3_positions(qt, dtype)
    if qt.layout == "pb":
        return _pb_positions(qt, dtype)
    if qt.layout == "bfp":
        from .qtensor import from_bfp
        qt = from_bfp(qt)
    if qt.split > 1:
        from .qtensor import from_subword
        qt = from_subword(qt)
    affine = qt.decode_affine
    keys = sorted(qt.planes)
    assert len(keys) == len(affine)
    beta = sum(b for _, b in affine)
    acc = None
    for key, (alpha, _) in zip(keys, affine):
        nibs = _nibble_planes(qt.planes[key])
        if acc is None:
            acc = [alpha * v for v in nibs]
        else:
            acc = [a + alpha * v for a, v in zip(acc, nibs)]
    return [(v + beta).astype(dtype) for v in acc]


def decode_weights(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Decode to a dense (q_out, q_in) weight matrix."""
    planes = decode_positions(qt, dtype)
    w = jnp.stack(planes, axis=-1)            # (q_out, Gp, 8)
    # pad groups sit at the end of the padded column range
    return w.reshape(qt.q_out, -1)[:, : qt.q_in].astype(dtype)
