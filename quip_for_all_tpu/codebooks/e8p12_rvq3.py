"""E8P RVQ 3-bit codebook: 2-bit E8P main stage + 1-bit E8 residual stage.

Parity target: ``/root/reference/codebook/e8p12_rvq3.py``. The residual grid
("E81B") has 256 entries: the E8 lattice points (integer or all-half-integer
coordinates, even sum) with norm^2 <= 2, plus 15 of the 16 +-2e_i vectors
(-2e_7 is omitted). A raw code is (main16 << 8) | resid8 (24 bits); the
checkpoint layout packs 4 codes into 3 int32 by dropping each code's unused
high byte (little-endian), ``codebook/e8p12_rvq3.py:102-107``.

Construction is combinatorial: the norm^2<=2 E8 points are the zero vector,
all +-e_i +- e_j (i<j), and all +-1/2 vectors with an even number of minus
signs; sorting lexicographically ascending (ints first, then half-ints)
reproduces the reference's cartesian-product occurrence order.
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from functools import lru_cache
from itertools import combinations, product
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Codebook, nearest_codeword
from .e8p12 import E8P12, full_grid

_NIBBLE_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


@lru_cache(maxsize=None)
def e81b_grid() -> np.ndarray:
    """(256, 8) float32 residual grid, reference order."""
    ints = [np.zeros(8)]
    for i, j in combinations(range(8), 2):
        for si, sj in product((1, -1), repeat=2):
            v = np.zeros(8)
            v[i], v[j] = si, sj
            ints.append(v)
    ints = np.array(sorted(map(tuple, ints)), dtype=np.float64)
    assert ints.shape[0] == 113

    halfs = []
    for signs in product((0.5, -0.5), repeat=8):
        if signs.count(-0.5) % 2 == 0:
            halfs.append(signs)
    halfs = np.array(sorted(halfs), dtype=np.float64)
    assert halfs.shape[0] == 128

    norm4 = np.concatenate([2 * np.eye(8), -2 * np.eye(8)[:7]], axis=0)
    return np.concatenate([ints, halfs, norm4], axis=0).astype(np.float32)


@lru_cache(maxsize=None)
def e81b_grid_packed() -> np.ndarray:
    """(256,) int32 nibble-packed residual grid (values x2, cols shuffled
    [0,2,4,6,1,3,5,7], 4-bit two's complement) — kernel-table parity with the
    reference's ``e81b_grid_packed`` (``codebook/e8p12_rvq3.py:53-62``)."""
    g = e81b_grid().astype(np.float64)[:, list(_NIBBLE_ORDER)]
    gi = np.round(g * 2).astype(np.int64) & 0xF
    acc = gi[:, 0]
    for i in range(1, 8):
        acc |= gi[:, i] << (4 * i)
    return acc.astype(np.uint32).view(np.int32)


@dataclasses.dataclass(frozen=True)
class E8P12RVQ3B(Codebook):
    id: str = "E8P12RVQ3B"
    codesz: int = 8
    opt_scale: float = 0.98
    idx_dtype: np.dtype = dataclasses.field(default=np.dtype(np.int32))
    packsz: Fraction = Fraction(4, 3)
    opt_resid_scale: float = 1 / 2.04

    def grid(self) -> np.ndarray:
        return full_grid()

    def resid_grid(self) -> np.ndarray:
        return e81b_grid()

    def quantize(self, X: jax.Array) -> Tuple[jax.Array, jax.Array]:
        g = jnp.asarray(full_grid(), dtype=X.dtype)
        gn = jnp.asarray((full_grid() ** 2).sum(-1), dtype=X.dtype)
        main_vals, main_idx = nearest_codeword(X, g, gn)
        rg = jnp.asarray(e81b_grid(), dtype=X.dtype)
        rgn = jnp.asarray((e81b_grid() ** 2).sum(-1), dtype=X.dtype)
        resid = (X - main_vals) / self.opt_resid_scale
        r_vals, r_idx = nearest_codeword(resid, rg, rgn)
        vals = main_vals + r_vals * self.opt_resid_scale
        idx = (main_idx << 8) + r_idx
        return vals, idx

    def decode(self, idxs: jax.Array, dtype=jnp.float32) -> jax.Array:
        main = idxs >> 8
        resid = idxs & 0xFF
        g = jnp.asarray(full_grid(), dtype=dtype)
        rg = jnp.asarray(e81b_grid(), dtype=dtype)
        w = jnp.take(g, main, axis=0) + self.opt_resid_scale * jnp.take(
            rg, resid, axis=0)
        return w.reshape(idxs.shape[0], -1)

    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        m, n = idxs.shape
        assert n % 4 == 0, "in_features must be divisible by 32 for RVQ3"
        b = np.ascontiguousarray(idxs.astype("<i4")).view(np.uint8)
        b = b.reshape(m, n, 4)[:, :, :3]  # drop unused high byte
        return np.ascontiguousarray(b).reshape(m, -1).view("<i4")

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        m = packed.shape[0]
        b = np.ascontiguousarray(packed.astype("<i4")).view(np.uint8)
        b = b.reshape(m, -1, 3)
        out = np.zeros((m, b.shape[1], 4), dtype=np.uint8)
        out[:, :, :3] = b
        return np.ascontiguousarray(out.reshape(m, -1)).view(
            "<i4").astype(np.int32)
