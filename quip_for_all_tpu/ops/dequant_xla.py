"""Pure-XLA codebook decode (dequantize to dense) for all codebook families.

Replaces the reference's CUDA decompress kernels (N2,
``quip_cuda/origin_order.cu:794-1074``). Used for prefill / large-m matmuls
(decode once, then one big MXU matmul) and for the training path's dense
weight materialization (``qlinear.py:144-159``). The bs=1 decode hot path
uses the fused Pallas kernels in ops/dequant_pallas.py instead.

Decode strategy: gathers from host-built tables via jnp.take. The E8P full
2^16-entry table (1 MB in bf16) makes E8P decode a single gather per 8
weights; HI decodes arithmetically (its grid is value = nibble - 7.5, no
table at all).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import e8p12, e8p12_rvq3
from ..codebooks.d4 import d4_grid
from .qtensor import QuantizedTensor


def _i16_to_u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.uint32)


@lru_cache(maxsize=None)
def _table(name: str, dtype_str: str) -> np.ndarray:
    t = {
        "e8p": e8p12.full_grid,
        "e81b": e8p12_rvq3.e81b_grid,
        "d4": d4_grid,
    }[name]()
    return t.astype(dtype_str)


def decode_weights(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Decode to a dense (q_out, q_in) weight matrix."""
    cid = qt.codebook_id
    dt = np.dtype(dtype).name if not isinstance(dtype, str) else dtype
    if cid == "E8P12":
        idx = _i16_to_u32(qt.planes["idx"]).astype(jnp.int32)
        g = jnp.asarray(_table("e8p", dt))
        w = jnp.take(g, idx, axis=0)
    elif cid == "D4":
        g = jnp.asarray(_table("d4", dt))
        w = jnp.take(g, qt.planes["idx"].astype(jnp.int32), axis=0)
    elif cid == "HI":
        q = jax.lax.bitcast_convert_type(qt.planes["idx"], jnp.uint32)
        # nibble k holds column order [0,2,4,6,1,3,5,7][k] of each 8-group
        nibs = [(q >> (4 * k)) & 0xF for k in range(8)]
        cols = [None] * 8
        for k, col in enumerate((0, 2, 4, 6, 1, 3, 5, 7)):
            cols[col] = nibs[k].astype(dtype) - jnp.asarray(7.5, dtype)
        w = jnp.stack(cols, axis=-1)
    elif cid == "E8P12RVQ3B":
        idx = _i16_to_u32(qt.planes["idx"]).astype(jnp.int32)
        g = jnp.asarray(_table("e8p", dt))
        rg = jnp.asarray(_table("e81b", dt))
        w = jnp.take(g, idx, axis=0) + jnp.asarray(
            qt.opt_resid_scale, dtype) * jnp.take(
            rg, qt.planes["resid"].astype(jnp.int32), axis=0)
    elif cid == "E8P12RVQ4B":
        main = _i16_to_u32(qt.planes["idx"]).astype(jnp.int32)
        resid = _i16_to_u32(qt.planes["resid"]).astype(jnp.int32)
        g = jnp.asarray(_table("e8p", dt))
        w = jnp.take(g, main, axis=0) + jnp.asarray(
            qt.opt_resid_scale, dtype) * jnp.take(g, resid, axis=0)
    else:
        raise ValueError(cid)
    return w.reshape(qt.q_out, qt.q_in).astype(dtype)
