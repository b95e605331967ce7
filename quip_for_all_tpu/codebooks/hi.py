"""HI 4-bit codebook: scalar half-integer grid {-7.5, ..., 7.5}.

Parity target: ``/root/reference/codebook/hi.py``. codesz=1; eight 4-bit
codes are interleaved into one int32 in order 0,2,4,6,1,3,5,7 (matching the
reference's half2-oriented nibble layout, ``codebook/hi.py:41-50``).
"""
from __future__ import annotations

import dataclasses
from fractions import Fraction
from functools import lru_cache

import numpy as np

from .base import Codebook

_NIBBLE_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


@lru_cache(maxsize=None)
def hi_grid() -> np.ndarray:
    return (np.arange(-8, 8, dtype=np.float32) + 0.5)[:, None]


@dataclasses.dataclass(frozen=True)
class HI4B1C(Codebook):
    id: str = "HI"
    codesz: int = 1
    opt_scale: float = 2.97
    idx_dtype: np.dtype = dataclasses.field(default=np.dtype(np.int32))
    packsz: Fraction = Fraction(8)

    def grid(self) -> np.ndarray:
        return hi_grid()

    def pack_idxs(self, idxs: np.ndarray) -> np.ndarray:
        m, n = idxs.shape
        assert n % 8 == 0
        idxs = idxs.astype(np.int64)
        acc = np.zeros((m, n // 8), dtype=np.int64)
        for nibble, col in enumerate(_NIBBLE_ORDER):
            acc |= (idxs[:, col::8] & 0xF) << (4 * nibble)
        return acc.astype(np.uint32).view(np.int32)

    def unpack_idxs(self, packed: np.ndarray) -> np.ndarray:
        m, np8 = packed.shape
        p = packed.view(np.uint32).astype(np.int64)
        out = np.zeros((m, np8 * 8), dtype=np.int32)
        for nibble, col in enumerate(_NIBBLE_ORDER):
            out[:, col::8] = ((p >> (4 * nibble)) & 0xF).astype(np.int32)
        return out
