"""Codebook base class for QuIP# lattice quantization, TPU-native.

Parity target: the five codebook classes of the reference
(``/root/reference/codebook/__init__.py:7-13``). Unlike the reference (torch
``nn.Module``s with CUDA decode ops), codebooks here are stateless frozen
dataclasses over host-side numpy grids; quantization-time nearest-neighbour
rounding is pure JAX (argmax over the grid, chunked so the (m, |grid|) score
matrix never exceeds a memory budget), and inference-time decode is handled by
``quip_for_all_tpu.ops`` (XLA / Pallas).
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Keep quantize-time score matrices below ~256 MB per chunk.
_ARGMAX_CHUNK = 8192


def nearest_codeword(X: jax.Array, grid: jax.Array, grid_norm: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """Nearest-neighbour rounding: argmax(2 X @ G.T - ||G||^2).

    Same objective as the reference round() (``codebook/e8p12.py:125-128``):
    minimizing ||x - g||^2 over the grid is equivalent to maximizing
    2<x, g> - ||g||^2. Runs as a scan over grid chunks so an m x 65536 score
    matrix is never materialized at once; each chunk is an MXU matmul.
    """
    m, codesz = X.shape
    n = grid.shape[0]
    if n <= _ARGMAX_CHUNK:
        scores = 2.0 * X @ grid.T - grid_norm[None, :]
        idx = jnp.argmax(scores, axis=-1)
        return grid[idx], idx.astype(jnp.int32)

    n_chunks = n // _ARGMAX_CHUNK
    assert n % _ARGMAX_CHUNK == 0
    grid_c = grid.reshape(n_chunks, _ARGMAX_CHUNK, codesz)
    norm_c = grid_norm.reshape(n_chunks, _ARGMAX_CHUNK)

    def body(carry, chunk):
        best_score, best_idx, base = carry
        g, gn = chunk
        scores = 2.0 * X @ g.T - gn[None, :]
        local_best = jnp.argmax(scores, axis=-1)
        local_score = jnp.take_along_axis(scores, local_best[:, None],
                                          axis=-1)[:, 0]
        better = local_score > best_score
        best_score = jnp.where(better, local_score, best_score)
        best_idx = jnp.where(better, base + local_best.astype(jnp.int32),
                             best_idx)
        return (best_score, best_idx, base + _ARGMAX_CHUNK), None

    init = (jnp.full((m,), -jnp.inf, dtype=X.dtype),
            jnp.zeros((m,), dtype=jnp.int32),
            jnp.int32(0))
    (_, idx, _), _ = jax.lax.scan(body, init, (grid_c, norm_c))
    return grid[idx], idx


@dataclasses.dataclass(frozen=True)
class Codebook:
    """A lattice codebook.

    Attributes mirror the reference codebook contract
    (``codebook/e8p12.py:110-116``): ``codesz`` is the vector dimension each
    code index covers, ``packsz`` how many raw indices fold into one stored
    element (Fraction(4,3) for the 3-bit RVQ 24-bit repack), ``idx_dtype`` the
    *checkpoint* dtype of packed indices.
    """
    id: str
    codesz: int
    opt_scale: float
    idx_dtype: np.dtype
    packsz: Fraction
    pack_out: bool = False
    version: int = 0

    # ---- grids (host numpy, built once per process) ----
    def grid(self) -> np.ndarray:              # (n_codes, codesz) f32
        raise NotImplementedError

    def grid_norm(self) -> np.ndarray:
        g = self.grid()
        return (g * g).sum(-1)

    # ---- quantization-time rounding (JAX) ----
    def quantize(self, X: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Round rows of X (m, codesz) to codewords; returns (vals, idx i32)."""
        g = jnp.asarray(self.grid(), dtype=X.dtype)
        gn = jnp.asarray(self.grid_norm(), dtype=X.dtype)
        return nearest_codeword(X, g, gn)

    # ---- packing: raw int32 indices -> checkpoint layout ----
    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        """(out, in/codesz) raw indices -> checkpoint array of idx_dtype."""
        return idxs.astype(self.idx_dtype)

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        """Inverse of pack_idxs: checkpoint array -> raw int32 indices."""
        return packed.astype(np.int64).astype(np.int32)

    # ---- decode (XLA reference path; Pallas kernels live in ops/) ----
    def decode(self, idxs: jax.Array, dtype=jnp.float32) -> jax.Array:
        """Raw indices (out, in/codesz) -> dense weights (out, in)."""
        g = jnp.asarray(self.grid(), dtype=dtype)
        w = jnp.take(g, idxs, axis=0)
        return w.reshape(idxs.shape[0], -1)

    @property
    def bits_per_weight(self) -> float:
        nbits = {"D4": 2, "E8P12": 2, "E8P12RVQ3B": 3, "E8P12RVQ4B": 4,
                 "HI": 4}[self.id]
        return float(nbits)
