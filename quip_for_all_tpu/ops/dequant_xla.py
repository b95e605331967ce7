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


def decode_positions(qt: QuantizedTensor, dtype=jnp.float32):
    """-> list of 8 (q_out, G_padded) planes; plane i holds weight 8g+i."""
    if qt.layout == "paired":
        return _paired_positions(qt, dtype)
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
