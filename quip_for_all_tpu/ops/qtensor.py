"""QuantizedTensor: runtime container for lattice-coded weights.

Checkpoint layout keeps the reference's packed formats (SURVEY.md §5,
``qlinear.py:44-57``) for interoperability. The RUNTIME layout is chosen for
the TPU decode path measured fastest on hardware (tools/microbench_decode.py):
Mosaic's dynamic_gather sustains only ~1 gather / 3.4 cycles while plain VPU
arithmetic issues ~4 ops/cycle, so codes are re-encoded at load time into
**affine nibble word planes** — one int32 per 8-weight group holding 8
UNSIGNED nibbles, with a single static affine decode shared by every
codebook family:

    weight_i = alpha * nib_i + beta,   nib_i = (word >> 4*i) & 0xF

  E8P12 (and each RVQ stage): every codeword entry is
      sign*{0.5,1.5,2.5} ± 0.25 = u - 2.5 ± 0.25 with u in {0..5} and the
      ±0.25 parity shared per group, so nib = 2u + 1 - parity in {0..11}
      and (alpha, beta) = (0.5, -2.75)
  half-integer signed family (D4; E8P12RVQ3B residual): nib = 2*weight + 8,
      (alpha, beta) = (0.5, -4)
  HI: nib = code, (alpha, beta) = (1, -7.5)

The affine form is what makes the decode speed-of-light on the VPU: the
per-nibble work is exactly {shift, mask, convert} (the i=0 shift and i=7
mask vanish), alpha folds into a per-tile epilogue scalar, and beta folds
into ``beta * rowsum(x)`` — one rank-1 correction per output tile instead
of a per-element offset add (see ops/dequant_pallas.py). Residual stages
are additional plane sets with their own (alpha, beta) scaled by
opt_resid_scale. This trades stored density (4 bits/weight for the 2-bit
codebooks) for a zero-gather decode; HBM streaming stays below the VPU
decode cost, so bs=1 decode remains decode-bound, not bandwidth-bound.

Plane columns are padded to 128-lane multiples; pad groups decode to
garbage but every consumer slices them off or zeroes the matching x lanes.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook, get_codebook
from ..codebooks import e8p12, e8p12_rvq3
from ..codebooks.d4 import d4_grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """Lattice-coded weight matrix of logical shape (q_out, q_in).

    planes (all int32, shape (q_out, ceil(q_in/8 /128)*128)):
      E8P12:      {"w0"}                 main word plane
      E8P12RVQ4B: {"w0", "w1"}          main + residual (both E8P words)
      E8P12RVQ3B: {"w0", "w1"}          main E8P word + signed-nibble resid
      D4:         {"w0"}                 signed nibbles (2 lattice pts/word)
      HI:         {"w0"}                 unsigned nibbles
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

    @property
    def decode_affine(self):
        """Per-plane-set static (alpha, beta): weight = sum_s alpha_s*nib_s
        + sum_s beta_s over the word planes, in sorted plane-key order."""
        return decode_affine(self.codebook_id, self.opt_resid_scale)


def decode_affine(codebook_id: str, opt_resid_scale: float = -1.0):
    E8P = (0.5, -2.75)    # nib = 2u + 1 - parity, weight = u - 2.5 ± 0.25
    SNIB = (0.5, -4.0)    # nib = 2*weight + 8
    if codebook_id == "E8P12":
        return (E8P,)
    if codebook_id == "E8P12RVQ4B":
        rs = opt_resid_scale
        return (E8P, (E8P[0] * rs, E8P[1] * rs))
    if codebook_id == "E8P12RVQ3B":
        rs = opt_resid_scale
        return (E8P, (SNIB[0] * rs, SNIB[1] * rs))
    if codebook_id == "D4":
        return (SNIB,)
    if codebook_id == "HI":
        return ((1.0, -7.5),)
    raise ValueError(codebook_id)


def _pad_cols(a: np.ndarray, mult: int = 128) -> np.ndarray:
    pad = (-a.shape[1]) % mult
    return a if pad == 0 else np.pad(a, ((0, 0), (0, pad)))


# ------------------------------------------------- encode helpers (numpy)

def _e8p_words_from_idx(idx16: np.ndarray) -> np.ndarray:
    """(..., G) uint16 E8P codes -> int32 affine-nibble word plane."""
    vals = e8p12.full_grid()[idx16.astype(np.int64)]      # (..., G, 8)
    # weight = 0.5*nib - 2.75 exactly (entries are u - 2.5 ± 0.25, the
    # ±0.25 parity shared per codeword), so nib = 2*weight + 5.5 in {0..11}
    nib = np.rint(vals * 2 + 5.5).astype(np.int64)
    assert nib.min() >= 0 and nib.max() <= 15
    word = np.zeros(idx16.shape, dtype=np.int64)
    for i in range(8):
        word |= nib[..., i] << (4 * i)
    return word.astype(np.uint32).view(np.int32)


@lru_cache(maxsize=None)
def _e8p_inverse_keys():
    """Sorted integer keys of the full E8P grid for word->idx recovery."""
    g = e8p12.full_grid().astype(np.float64)
    keys = _vals_key(g)
    order = np.argsort(keys)
    return keys[order], order.astype(np.int64)


def _vals_key(vals: np.ndarray) -> np.ndarray:
    """Encode an (..., 8) half-integer-grid row as a unique int64 key."""
    q = np.rint(vals * 4).astype(np.int64) + 64           # positive
    key = np.zeros(vals.shape[:-1], dtype=np.int64)
    for i in range(8):
        key = key * 129 + q[..., i]
    return key


def _e8p_idx_from_words(words: np.ndarray) -> np.ndarray:
    """int32 word plane -> uint16 E8P codes (exact inverse)."""
    w = words.view(np.uint32).astype(np.int64)
    vals = np.stack([((w >> (4 * i)) & 0xF).astype(np.float64)
                     for i in range(8)], axis=-1) * 0.5 - 2.75
    keys = _vals_key(vals)
    skeys, order = _e8p_inverse_keys()
    pos = np.searchsorted(skeys, keys)
    assert np.array_equal(skeys[pos], keys), "non-codeword in E8P plane"
    return order[pos].astype(np.uint16)


def _nibble_words_from_vals(vals: np.ndarray) -> np.ndarray:
    """(..., G, 8) half-integer values in [-4, 3.5] -> int32 biased-nibble
    words (nib = 2*v + 8, decode weight = 0.5*nib - 4)."""
    t = np.rint(vals * 2).astype(np.int64) + 8
    assert t.min() >= 0 and t.max() <= 15
    word = np.zeros(vals.shape[:-1], dtype=np.int64)
    for i in range(8):
        word |= t[..., i] << (4 * i)
    return word.astype(np.uint32).view(np.int32)


def _nibble_vals_from_words(words: np.ndarray) -> np.ndarray:
    w = words.view(np.uint32).astype(np.int64)
    out = np.empty(words.shape + (8,), dtype=np.float64)
    for i in range(8):
        nib = (w >> (4 * i)) & 0xF
        out[..., i] = (nib - 8) * 0.5
    return out


# ------------------------------------------------- raw idx <-> runtime

def from_raw_idxs(cb: Codebook, idxs: np.ndarray,
                  q_out: int, q_in: int) -> QuantizedTensor:
    """Raw int32 code indices (q_out, q_in/codesz) -> runtime planes."""
    if cb.id == "E8P12":
        w0 = _e8p_words_from_idx(idxs.astype(np.int64).astype(np.uint16))
        planes = {"w0": jnp.asarray(_pad_cols(w0))}
    elif cb.id == "E8P12RVQ4B":
        u = np.ascontiguousarray(idxs).view(np.uint32).astype(np.int64)
        planes = {
            "w0": jnp.asarray(_pad_cols(_e8p_words_from_idx(
                (u >> 16).astype(np.uint16)))),
            "w1": jnp.asarray(_pad_cols(_e8p_words_from_idx(
                (u & 0xFFFF).astype(np.uint16)))),
        }
    elif cb.id == "E8P12RVQ3B":
        u = np.ascontiguousarray(idxs).view(np.uint32).astype(np.int64)
        resid_vals = e8p12_rvq3.e81b_grid()[(u & 0xFF)]
        planes = {
            "w0": jnp.asarray(_pad_cols(_e8p_words_from_idx(
                (u >> 8).astype(np.uint16)))),
            "w1": jnp.asarray(_pad_cols(_nibble_words_from_vals(
                resid_vals))),
        }
    elif cb.id == "D4":
        vals = d4_grid()[idxs.astype(np.int64)]           # (q_out, G4, 4)
        assert q_in % 8 == 0
        vals8 = vals.reshape(q_out, q_in // 8, 8)
        planes = {"w0": jnp.asarray(_pad_cols(
            _nibble_words_from_vals(vals8)))}
    elif cb.id == "HI":
        idxs = idxs.astype(np.int64).reshape(q_out, q_in // 8, 8)
        word = np.zeros((q_out, q_in // 8), dtype=np.int64)
        for i in range(8):
            word |= (idxs[..., i] & 0xF) << (4 * i)
        planes = {"w0": jnp.asarray(_pad_cols(
            word.astype(np.uint32).view(np.int32)))}
    else:
        raise ValueError(cb.id)
    ors = getattr(cb, "opt_resid_scale", -1.0)
    return QuantizedTensor(planes, cb.id, q_out, q_in, float(ors))


def to_raw_idxs(qt: QuantizedTensor) -> np.ndarray:
    """Runtime planes -> raw int32 code indices (exact inverse)."""
    cb = qt.codebook
    ncols = qt.q_in // 8
    if cb.id == "E8P12":
        w0 = np.asarray(qt.planes["w0"])[:, :ncols]
        return _e8p_idx_from_words(w0).astype(np.int64).astype(
            np.uint32).view(np.int32)
    if cb.id == "E8P12RVQ4B":
        main = _e8p_idx_from_words(
            np.asarray(qt.planes["w0"])[:, :ncols]).astype(np.int64)
        resid = _e8p_idx_from_words(
            np.asarray(qt.planes["w1"])[:, :ncols]).astype(np.int64)
        return ((main << 16) | resid).astype(np.uint32).view(np.int32)
    if cb.id == "E8P12RVQ3B":
        main = _e8p_idx_from_words(
            np.asarray(qt.planes["w0"])[:, :ncols]).astype(np.int64)
        rvals = _nibble_vals_from_words(
            np.asarray(qt.planes["w1"])[:, :ncols])
        rkeys = _vals_key(rvals)
        gkeys = _vals_key(e8p12_rvq3.e81b_grid().astype(np.float64))
        order = np.argsort(gkeys)
        pos = np.searchsorted(gkeys[order], rkeys)
        assert np.array_equal(gkeys[order][pos], rkeys)
        resid = order[pos]
        return ((main << 8) | resid).astype(np.uint32).view(np.int32)
    if cb.id == "D4":
        vals8 = _nibble_vals_from_words(
            np.asarray(qt.planes["w0"])[:, :ncols])
        vals = vals8.reshape(qt.q_out, qt.q_in // 4, 4)
        gkeys4 = _vals_key4(d4_grid().astype(np.float64))
        order = np.argsort(gkeys4)
        keys = _vals_key4(vals)
        pos = np.searchsorted(gkeys4[order], keys)
        assert np.array_equal(gkeys4[order][pos], keys)
        return order[pos].astype(np.int32)
    if cb.id == "HI":
        w = np.asarray(qt.planes["w0"])[:, :ncols].view(
            np.uint32).astype(np.int64)
        out = np.empty((qt.q_out, qt.q_in), dtype=np.int32)
        for i in range(8):
            out[:, i::8] = ((w >> (4 * i)) & 0xF).astype(np.int32)
        return out
    raise ValueError(cb.id)


def _vals_key4(vals: np.ndarray) -> np.ndarray:
    q = np.rint(vals * 4).astype(np.int64) + 64
    key = np.zeros(vals.shape[:-1], dtype=np.int64)
    for i in range(4):
        key = key * 129 + q[..., i]
    return key


# ------------------------------------------------- checkpoint layout

def to_checkpoint_idxs(qt: QuantizedTensor) -> np.ndarray:
    """Runtime planes -> reference checkpoint Qidxs array (numpy)."""
    cb = qt.codebook
    raw = to_raw_idxs(qt)
    if cb.id == "E8P12":
        return raw.astype(np.int64).astype(np.uint16).view(np.int16)
    if cb.id == "D4":
        return raw.astype(np.uint8)
    return cb.pack_idxs(raw) if cb.id in ("HI", "E8P12RVQ3B") else raw


def from_checkpoint_idxs(cb: Codebook, packed: np.ndarray,
                         q_out: int, q_in: int) -> QuantizedTensor:
    """Reference checkpoint Qidxs array -> runtime planes."""
    raw = cb.unpack_idxs(packed)
    return from_raw_idxs(cb, raw, q_out, q_in)
