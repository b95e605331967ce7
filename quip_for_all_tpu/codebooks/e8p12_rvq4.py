"""E8P RVQ 4-bit codebook: two cascaded 2-bit E8P lookups.

Parity target: ``/root/reference/codebook/e8p12_rvq4.py``. A raw code is
(main16 << 16) | resid16 in one int32; decode is
grid[main] + opt_resid_scale * grid[resid].
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Codebook, nearest_codeword
from .e8p12 import full_grid


@dataclasses.dataclass(frozen=True)
class E8P12RVQ4B(Codebook):
    id: str = "E8P12RVQ4B"
    codesz: int = 8
    opt_scale: float = 1.03
    idx_dtype: np.dtype = dataclasses.field(default=np.dtype(np.int32))
    packsz: Fraction = Fraction(1)
    opt_resid_scale: float = 1 / 3.45

    def grid(self) -> np.ndarray:
        return full_grid()

    def quantize(self, X: jax.Array) -> Tuple[jax.Array, jax.Array]:
        g = jnp.asarray(full_grid(), dtype=X.dtype)
        gn = jnp.asarray((full_grid() ** 2).sum(-1), dtype=X.dtype)
        main_vals, main_idx = nearest_codeword(X, g, gn)
        resid = (X - main_vals) / self.opt_resid_scale
        r_vals, r_idx = nearest_codeword(resid, g, gn)
        vals = main_vals + r_vals * self.opt_resid_scale
        idx = (main_idx << 16) + r_idx
        return vals, idx

    def decode(self, idxs: jax.Array, dtype=jnp.float32) -> jax.Array:
        u = jax.lax.bitcast_convert_type(idxs.astype(jnp.int32), jnp.uint32)
        main = (u >> 16).astype(jnp.int32)
        resid = (u & 0xFFFF).astype(jnp.int32)
        g = jnp.asarray(full_grid(), dtype=dtype)
        w = jnp.take(g, main, axis=0) + self.opt_resid_scale * jnp.take(
            g, resid, axis=0)
        return w.reshape(idxs.shape[0], -1)

    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        return idxs.astype(np.uint32).view(np.int32)

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        return packed.view(np.int32)
