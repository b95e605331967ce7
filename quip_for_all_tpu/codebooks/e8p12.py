"""E8P12 2-bit lattice codebook (E8 "padded-12"), TPU-native construction.

Semantics match the reference (``/root/reference/codebook/e8p12.py``):
the codebook is the set of all 2^16 vectors obtained from 256 "absolute
patterns" (227 |D8^|-ball entries + 29 norm-12 entries), 2^7 effective sign
flips, and a +-1/4 parity shift. An index c in [0, 2^16) decodes as:

    signs   = c & 0xFF            (8 sign bits)
    abs_idx = c >> 8              (which of the 256 abs patterns)
    parity  = popcount(signs) & 1
    signs  ^= parity              (flip LSB when parity is odd)
    w[i]    = sign_{bit 7-shuffle[i]}(signs) * abs[abs_idx, shuffle[i]]
              + (parity ? -0.25 : +0.25)

where shuffle = [0,2,1,3,4,6,5,7] (an involution) and abs values are stored
x4 as int8 bytes of a packed int64 (byte ii = position ii of the pattern,
after the same column shuffle and a parity-dependent sign flip of column 7).

Construction here is direct (combinatorial) rather than the reference's 8^8
cartesian-product sieve: the 227 abs patterns are exactly the lexicographically
sorted elements of {0.5,1.5,2.5}^8 with norm^2 <= 10 (every such pattern admits
an even-sum signing since each flip changes the integer sum by an odd amount),
which reproduces torch.unique's sorted order.
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from functools import lru_cache
from itertools import product
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Codebook, nearest_codeword

E8P_CODESZ = 8
_SHUFFLE = np.array([0, 2, 1, 3, 4, 6, 5, 7])

# 29 extra norm-12 abs patterns (values x2), fixed order defines indices
# 227..255 of the abs grid (reference ``codebook/e8p12.py:28-60``).
_NORM12_X2 = np.array([
    [3, 1, 1, 1, 3, 3, 3, 3],
    [1, 3, 1, 1, 3, 3, 3, 3],
    [1, 1, 3, 1, 3, 3, 3, 3],
    [1, 1, 1, 3, 3, 3, 3, 3],
    [3, 3, 3, 1, 3, 3, 1, 1],
    [3, 3, 3, 1, 3, 1, 3, 1],
    [3, 3, 3, 1, 1, 3, 3, 1],
    [3, 3, 3, 1, 3, 1, 1, 3],
    [3, 3, 3, 1, 1, 3, 1, 3],
    [3, 3, 3, 1, 1, 1, 3, 3],
    [3, 3, 1, 3, 3, 3, 1, 1],
    [3, 3, 1, 3, 3, 1, 3, 1],
    [3, 3, 1, 3, 1, 3, 3, 1],
    [3, 3, 1, 3, 3, 1, 1, 3],
    [3, 3, 1, 3, 1, 3, 1, 3],
    [3, 3, 1, 3, 1, 1, 3, 3],
    [3, 1, 3, 3, 3, 3, 1, 1],
    [3, 1, 3, 3, 3, 1, 3, 1],
    [3, 1, 3, 3, 1, 3, 3, 1],
    [3, 1, 3, 3, 3, 1, 1, 3],
    [3, 1, 3, 3, 1, 3, 1, 3],
    [1, 3, 3, 3, 1, 1, 3, 3],
    [1, 3, 3, 3, 3, 3, 1, 1],
    [1, 3, 3, 3, 3, 1, 3, 1],
    [1, 3, 3, 3, 1, 3, 3, 1],
    [1, 3, 3, 3, 3, 1, 1, 3],
    [1, 3, 3, 3, 1, 3, 1, 3],
    [1, 1, 3, 3, 1, 3, 3, 3],
    [3, 3, 1, 1, 3, 3, 3, 1],
], dtype=np.float64)


@lru_cache(maxsize=None)
def abs_grid_raw() -> np.ndarray:
    """The 256 abs patterns in canonical order, before shuffle/sign tricks.

    Rows 0..226: sorted {0.5,1.5,2.5}^8 patterns with norm^2 <= 10.
    Rows 227..255: the fixed norm-12 patterns.
    """
    pats = []
    for p in product((0.5, 1.5, 2.5), repeat=8):
        if sum(v * v for v in p) <= 10.0:
            pats.append(p)
    d8abs = np.array(sorted(pats), dtype=np.float64)
    assert d8abs.shape == (227, 8)
    return np.concatenate([d8abs, _NORM12_X2 / 2.0], axis=0)


@lru_cache(maxsize=None)
def abs_grid_bytes() -> np.ndarray:
    """(256, 8) int8: column-shuffled abs patterns x4, col 7 sign-flipped on
    odd row sum — byte j is what the reference packs at bits [8j, 8j+8) of its
    int64 ``grid_packed_abs`` (``codebook/e8p12.py:63-79``)."""
    cba = abs_grid_raw()[:, _SHUFFLE].copy()
    row_sum = cba.sum(axis=1)  # integral for all rows
    cba[:, 7] *= 1.0 - 2.0 * (np.round(row_sum).astype(np.int64) % 2)
    return np.round(cba * 4.0).astype(np.int8)


@lru_cache(maxsize=None)
def packed_abs_grid() -> np.ndarray:
    """(256,) int64 packed abs grid — checkpoint/kernel-table parity with the
    reference's ``grid_packed_abs``."""
    b = abs_grid_bytes().astype(np.int64) & 0xFF
    acc = b[:, 0]
    for i in range(1, 8):
        acc = acc | (b[:, i] << (8 * i))
    return acc


@lru_cache(maxsize=None)
def full_grid() -> np.ndarray:
    """(65536, 8) float32 — decode of every 16-bit index (vectorized form of
    the reference's ``get_full_grid``, ``codebook/e8p12.py:82-103``)."""
    c = np.arange(1 << 16, dtype=np.int64)
    signs = c & 0xFF
    abs_idx = c >> 8
    # parity = popcount(signs) & 1 via xor-fold
    p = signs ^ (signs >> 4)
    p ^= p >> 2
    p ^= p >> 1
    parity = p & 1
    signs = signs ^ parity  # flips bit 0 when parity odd

    byts = abs_grid_bytes().astype(np.float32)  # (256, 8) int8 values
    out = np.empty((1 << 16, 8), dtype=np.float32)
    for i in range(8):
        ii = _SHUFFLE[i]
        v = byts[abs_idx, ii] / 4.0
        bit = (signs >> (7 - ii)) & 1
        v = np.where(bit == 1, -v, v)
        out[:, i] = v
    out += np.where(parity == 1, -0.25, 0.25)[:, None].astype(np.float32)
    return out


@dataclasses.dataclass(frozen=True)
class E8P12(Codebook):
    id: str = "E8P12"
    codesz: int = E8P_CODESZ
    opt_scale: float = 1.03
    idx_dtype: np.dtype = dataclasses.field(default=np.dtype(np.int16))
    packsz: Fraction = Fraction(1)
    version: int = 1

    def grid(self) -> np.ndarray:
        return full_grid()

    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        # raw 0..65535 -> int16 bit pattern (checkpoint parity: the reference
        # stores idx_dtype=int16, ``codebook/e8p12.py:113``).
        return idxs.astype(np.uint16).view(np.int16)

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        return packed.view(np.uint16).astype(np.int32)
