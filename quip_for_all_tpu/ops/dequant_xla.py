"""Pure-XLA codebook decode (dequantize to dense) from arithmetic word
planes — replaces the reference's CUDA decompress kernels (N2,
``quip_cuda/origin_order.cu:794-1074``).

Used for prefill / large-m matmuls (decode once, then one big MXU matmul)
and the training path's dense weight materialization (``qlinear.py:144-159``).
Decode is shifts/masks/converts only (see ops/qtensor.py for the word
formats) — no gathers, so XLA fuses it well on both CPU and TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .qtensor import QuantizedTensor


def _u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _e8p_positions(w_i32, dtype):
    """int32 E8P word plane (..., G) -> list of 8 (..., G) value planes."""
    w = _u32(w_i32)
    parity = (w >> 24) & 1
    offm = jnp.asarray(-2.25, jnp.float32) - 0.5 * parity.astype(jnp.float32)
    return [(((w >> (3 * i)) & 7).astype(jnp.float32) + offm).astype(dtype)
            for i in range(8)]


def _snib_positions(w_i32, dtype):
    """signed-nibble word plane -> 8 planes of value = s4 * 0.5."""
    w = _u32(w_i32)
    out = []
    for i in range(8):
        nib = ((w >> (4 * i)) & 0xF).astype(jnp.int32)
        s4 = jnp.where(nib >= 8, nib - 16, nib)
        out.append((s4.astype(jnp.float32) * 0.5).astype(dtype))
    return out


def _hi_positions(w_i32, dtype):
    w = _u32(w_i32)
    return [(((w >> (4 * i)) & 0xF).astype(jnp.float32) - 7.5).astype(dtype)
            for i in range(8)]


def decode_positions(qt: QuantizedTensor, dtype=jnp.float32):
    """-> list of 8 (q_out, G_padded) planes; plane i holds weight 8g+i."""
    cid = qt.codebook_id
    if cid == "E8P12":
        return _e8p_positions(qt.planes["w0"], dtype)
    if cid == "E8P12RVQ4B":
        rs = jnp.asarray(qt.opt_resid_scale, jnp.float32)
        main = _e8p_positions(qt.planes["w0"], jnp.float32)
        resid = _e8p_positions(qt.planes["w1"], jnp.float32)
        return [(a + rs * b).astype(dtype) for a, b in zip(main, resid)]
    if cid == "E8P12RVQ3B":
        rs = jnp.asarray(qt.opt_resid_scale, jnp.float32)
        main = _e8p_positions(qt.planes["w0"], jnp.float32)
        resid = _snib_positions(qt.planes["w1"], jnp.float32)
        return [(a + rs * b).astype(dtype) for a, b in zip(main, resid)]
    if cid == "D4":
        return _snib_positions(qt.planes["w0"], dtype)
    if cid == "HI":
        return _hi_positions(qt.planes["w0"], dtype)
    raise ValueError(cid)


def decode_weights(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Decode to a dense (q_out, q_in) weight matrix."""
    planes = decode_positions(qt, dtype)
    w = jnp.stack(planes, axis=-1)            # (q_out, Gp, 8)
    # pad groups sit at the end of the padded column range
    return w.reshape(qt.q_out, -1)[:, : qt.q_in].astype(dtype)
