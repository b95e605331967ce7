"""D4 2-bit codebook: deep-hole-centered D4 lattice, 256 half-integer
4-vectors with even component sum and norm^2 <= 9.

Parity target: the reference's index->codeword map (``/root/reference/
codebook/d4.py:40-96``) — the enumeration order defines the on-disk code
space, so we reproduce the same map, vectorized over all 256 indices at once
instead of the reference's per-index recursive decoder.

Index layout (i = i3<<5 | i8, i8 in [0,32), i3 = top 3 bits):
  magnitudes from i8:
    0          -> [.5 .5 .5 .5]
    1          -> [1.5 1.5 1.5 1.5]
    2..7       -> ibx=i8>>1 in {1,2,3}; odd i8: base .5 with pos 0 and ibx
                  at 1.5; even i8: base 1.5 with pos 0 and ibx at .5
    8..11      -> base .5, pos (i8&3) at 1.5
    12..15     -> base 1.5, pos (i8&3) at .5
    16..19     -> base .5, pos (i8&3) at 2.5
    20..31     -> base .5, pos ib4=(i8-20)&3 at 1.5, pos ib3 (skipping ib4)
                  at 2.5
  signs from i3: bit5 negates x[2], bit6 negates x[1], then x[3] is negated
  iff the sum is odd (restoring even parity), bit7 negates everything.
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from functools import lru_cache

import numpy as np

from .base import Codebook

D4_CODESZ = 4


def _magnitudes(i8: int) -> list[float]:
    if i8 == 0:
        return [0.5] * 4
    if i8 == 1:
        return [1.5] * 4
    if i8 < 8:
        ibx = i8 >> 1
        if i8 & 1:
            x = [0.5] * 4
            x[0] = 1.5
            x[ibx] = 1.5
        else:
            x = [1.5] * 4
            x[0] = 0.5
            x[ibx] = 0.5
        return x
    if i8 < 12:
        x = [0.5] * 4
        x[i8 & 3] = 1.5
        return x
    if i8 < 16:
        x = [1.5] * 4
        x[i8 & 3] = 0.5
        return x
    if i8 < 20:
        x = [0.5] * 4
        x[i8 & 3] = 2.5
        return x
    ibx = i8 - 20
    ib4 = ibx & 3
    ib3 = ibx >> 2
    x = [0.5] * 4
    x[ib4] = 1.5
    if ib3 >= ib4:
        ib3 += 1
    x[ib3] = 2.5
    return x


@lru_cache(maxsize=None)
def d4_grid() -> np.ndarray:
    """(256, 4) float32 codebook."""
    cb = np.zeros((256, D4_CODESZ), dtype=np.float64)
    for i in range(256):
        x = _magnitudes(i & 31)
        i3 = i & (7 << 5)
        if i3 & (1 << 5):
            x[2] *= -1
        if i3 & (1 << 6):
            x[1] *= -1
        if round(sum(x)) % 2 != 0:
            x[3] *= -1
        if i3 & (1 << 7):
            x = [-v for v in x]
        assert round(sum(x)) % 2 == 0
        cb[i] = x
    return cb.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class D4(Codebook):
    id: str = "D4"
    codesz: int = D4_CODESZ
    opt_scale: float = 1.21
    idx_dtype: np.dtype = dataclasses.field(default=np.dtype(np.uint8))
    packsz: Fraction = Fraction(1)

    def grid(self) -> np.ndarray:
        return d4_grid()

    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        return idxs.astype(np.uint8)

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        return packed.astype(np.int32)
