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


def decode_positions(qt: QuantizedTensor, dtype=jnp.float32):
    """-> list of 8 (q_out, G_padded) planes; plane i holds weight 8g+i."""
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
