"""QuantizedTensor: runtime container for lattice-coded weights.

The checkpoint layout keeps the reference's packed formats (SURVEY.md §5,
``qlinear.py:44-57``) for interoperability; at load time indices are
re-packed into TPU-friendly *runtime planes* (e.g. the 3-bit RVQ's 24-bit
packed stream becomes separate int16 main + uint8 residual planes so decode
needs no unaligned bit extraction).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook, get_codebook


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """Lattice-coded weight matrix of logical shape (q_out, q_in).

    planes: codebook-specific integer arrays:
      E8P12:      {"idx": (q_out, q_in/8) int16}
      D4:         {"idx": (q_out, q_in/4) uint8}
      HI:         {"idx": (q_out, q_in/8) int32}   (8 nibbles, interleaved)
      E8P12RVQ3B: {"idx": (q_out, q_in/8) int16, "resid": ... uint8}
      E8P12RVQ4B: {"idx": (q_out, q_in/8) int16, "resid": ... int16}
    """
    planes: Dict[str, jax.Array]
    codebook_id: str = dataclasses.field(metadata=dict(static=True))
    q_out: int = dataclasses.field(metadata=dict(static=True))
    q_in: int = dataclasses.field(metadata=dict(static=True))
    opt_resid_scale: float = dataclasses.field(
        default=-1.0, metadata=dict(static=True))

    @property
    def codebook(self) -> Codebook:
        return get_codebook(
            self.codebook_id,
            self.opt_resid_scale if self.opt_resid_scale > 0 else None)


def from_raw_idxs(cb: Codebook, idxs: np.ndarray,
                  q_out: int, q_in: int) -> QuantizedTensor:
    """Raw int32 code indices (q_out, q_in/codesz) -> runtime planes."""
    planes: Dict[str, jax.Array]
    if cb.id == "E8P12":
        planes = {"idx": jnp.asarray(idxs.astype(np.uint16).view(np.int16))}
    elif cb.id == "D4":
        planes = {"idx": jnp.asarray(idxs.astype(np.uint8))}
    elif cb.id == "HI":
        # runtime = checkpoint nibble packing (arithmetic decode, no tables)
        planes = {"idx": jnp.asarray(cb.pack_idxs(idxs))}
    elif cb.id == "E8P12RVQ3B":
        main = (idxs >> 8).astype(np.uint16).view(np.int16)
        resid = (idxs & 0xFF).astype(np.uint8)
        planes = {"idx": jnp.asarray(main), "resid": jnp.asarray(resid)}
    elif cb.id == "E8P12RVQ4B":
        u = idxs.astype(np.uint32)
        main = (u >> 16).astype(np.uint16).view(np.int16)
        resid = (u & 0xFFFF).astype(np.uint16).view(np.int16)
        planes = {"idx": jnp.asarray(main), "resid": jnp.asarray(resid)}
    else:
        raise ValueError(cb.id)
    ors = getattr(cb, "opt_resid_scale", -1.0)
    return QuantizedTensor(planes, cb.id, q_out, q_in, float(ors))


def to_checkpoint_idxs(qt: QuantizedTensor) -> np.ndarray:
    """Runtime planes -> reference checkpoint Qidxs array (numpy)."""
    cb = qt.codebook
    if cb.id in ("E8P12", "D4", "HI"):
        idx = np.asarray(qt.planes["idx"])
        if cb.id == "E8P12":
            return idx  # already int16 bit pattern
        return idx.astype(cb.idx_dtype) if cb.id == "D4" else idx
    main = np.asarray(qt.planes["idx"]).view(np.uint16).astype(np.int64)
    resid = np.asarray(qt.planes["resid"])
    if cb.id == "E8P12RVQ3B":
        raw = ((main << 8) | resid.astype(np.int64)).astype(np.int32)
        return cb.pack_idxs(raw)
    raw = ((main << 16) | resid.view(np.uint16).astype(np.int64))
    return raw.astype(np.uint32).view(np.int32)


def from_checkpoint_idxs(cb: Codebook, packed: np.ndarray,
                         q_out: int, q_in: int) -> QuantizedTensor:
    """Reference checkpoint Qidxs array -> runtime planes."""
    raw = cb.unpack_idxs(packed)
    return from_raw_idxs(cb, raw, q_out, q_in)
