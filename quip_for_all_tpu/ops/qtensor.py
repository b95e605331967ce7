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

**Paired RVQ4B layout** (``layout="paired"``, round 3): the affine-nibble
format spends 8 bits/weight on E8P12RVQ4B's two 2-bit stages — 2x the
stored density — and hardware shows the fused kernel is DMA-bound, so
RVQ4B decode runs at exactly half E8P12's rate. Exploiting the E8P
structure (weight = u - 2.25 - 0.5*parity with u in {0..5} and the parity
shared per 8-weight codeword — verified exhaustively over the full grid)
packs the PAIR of stages into ~6.5 bits/weight:

    w0 (q_out, Gp)    int32: position-i nibble = u0 | (u1 & 1) << 3
    w1 (q_out, Gp/2)  int32: 2-bit field (16h + 2i) = u1 >> 1 for group
                             h*Gp/2 + lane  (halves = group-range halves,
                             so kernel slices stay lane-contiguous)
    w2 (q_out, Wp)    int32: 2-bit field 2j = (p0, p1) parity pair of
                             group j*Wp + lane (Wp = smallest 128-multiple
                             dividing Gp with 16*Wp >= Gp)

Decode: u0 = lo4 & 7, u1 = 2*hi + (lo4 >> 3), value = u0 + rs*u1 — three
int-to-float converts + two FMAs per weight, still cheaper than the HBM
stream it saves (~19% less traffic; the per-group parity correction rides
16 skinny group-sum dots and the constant -2.25*(1+rs) rides the rowsum
beta term exactly like the nibble format). Gp pads to 256-lane multiples
so the half-plane w1 stays 128-lane aligned.
"""
from __future__ import annotations

import dataclasses
import os
from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook, get_codebook
from ..codebooks import e8p12, e8p12_rvq3
from ..codebooks.d4 import d4_grid


def subword_split_default() -> int:
    """Runtime plane storage split P (QFA_SPLIT_DECODE in {2, 4}): word
    planes load as int(32/P) subword arrays (layout "sw2"/"sw4", same
    bytes, lane P*g+j = subword j of group g) so the fused kernel's
    per-word decode is P-way packed — one shift/mask covers P positions
    and the dot sweep shrinks 8 -> 8/P. 1 = classic int32 nibble planes.

    Motivated by the r4 trace: kernels ran at 72-76% of their DMA floor
    with the VPU nibble decode exposed."""
    v = int(os.environ.get("QFA_SPLIT_DECODE", "0"))
    return v if v in (2, 4) else 1


def to_subword(qt: "QuantizedTensor", P: int) -> "QuantizedTensor":
    """nibble -> sw{P} re-layout: pure bitcast (same bytes), on device."""
    assert qt.layout == "nibble" and P in (2, 4)
    SW = jnp.int16 if P == 2 else jnp.int8
    planes = {}
    for k, v in qt.planes.items():
        b = jax.lax.bitcast_convert_type(v, SW)        # (q_out, Gp, P)
        planes[k] = b.reshape(v.shape[0], v.shape[1] * P)
    return dataclasses.replace(qt, planes=planes, layout=f"sw{P}")


def from_subword(qt: "QuantizedTensor") -> "QuantizedTensor":
    """sw{P} -> nibble (exact inverse of to_subword)."""
    P = qt.split
    if P == 1:
        return qt
    planes = {}
    for k, v in qt.planes.items():
        cols = v.shape[1] // P
        planes[k] = jax.lax.bitcast_convert_type(
            v.reshape(v.shape[0], cols, P), jnp.int32)
    return dataclasses.replace(qt, planes=planes, layout="nibble")


def bfp_default() -> bool:
    """Whether planes load into the bf16 lane-magic ("bfp") layout
    (QFA_BFP=1 to opt in; default OFF).

    The hypothesis (r4 trace): the fused kernels ran at 72-76% of their
    spec DMA floor because the per-word VPU nibble decode (14 int ops +
    8 converts) did not hide under the plane stream. After the subword
    (sw2/sw4) fix died on hardware (Mosaic cannot legalize arith.shrui
    on i16/i8 vectors, tools/R4_RESULTS.jsonl kern_split rows), bfp
    reached the same op cut with ONLY i32 ops: each plane is re-packed
    (same bytes) so one i32 word holds the same nibble position q for an
    output-row PAIR (one row per 16-bit half), the kernel extracts a
    pair with shift/mask 0x000F000F, ORs in 0x43004300 (bf16 0x4300 =
    128.0, so each half becomes 128+nib EXACTLY), a free sublane-packed
    bitcast to bf16 doubles the rows back, and one exact bf16 subtract
    restores nib — ~13 ops + zero converts per word vs 22.

    Measured on hardware (whole-model 7B bs=1, R4_RESULTS): bfp 142.5
    vs nibble 143.2 tok/s; RVQ4B 85.9 vs 83.7 — NO whole-model change
    despite the ~40%-fewer-VPU-ops kernel. Together with the ksplit,
    magic and paired falsifications this rules VPU decode work OUT as
    the decode-shape bottleneck (the gap to the spec DMA floor lies
    elsewhere — see tools/microbench_tn.py). Default stays nibble; the
    layout remains a tested opt-in and the record of that result."""
    return os.environ.get("QFA_BFP", "0") == "1"


def to_bfp(qt: "QuantizedTensor") -> "QuantizedTensor":
    """nibble -> bfp re-layout (same bytes, on device).

    Each int32 nibble plane (q_out, Gp) becomes (2, q_out/2, Gp):
      [0] (A): nibble positions 0..3 — lo16 of output row 2t' in the low
               half, lo16 of row 2t'+1 in the high half
      [1] (B): nibble positions 4..7, same row pairing
    so that in-kernel ((w >> 4k) & 0x000F000F | 0x43004300) bitcast to
    bf16 lands output rows (2t', 2t'+1) on consecutive sublanes (Mosaic's
    i32->bf16 bitcast packs sublanes interleaved, lo half first)."""
    assert qt.layout == "nibble" and qt.q_out % 2 == 0
    planes = {}
    for k, v in qt.planes.items():
        w = jax.lax.bitcast_convert_type(v, jnp.uint32)
        we, wo = w[0::2], w[1::2]                  # rows 2t', 2t'+1
        a = (we & 0xFFFF) | (wo << 16)
        b = (we >> 16) | (wo & jnp.uint32(0xFFFF0000))
        planes[k] = jax.lax.bitcast_convert_type(
            jnp.stack([a, b]), jnp.int32)          # (2, q_out/2, Gp)
    return dataclasses.replace(qt, planes=planes, layout="bfp")


def from_bfp(qt: "QuantizedTensor") -> "QuantizedTensor":
    """bfp -> nibble (exact inverse of to_bfp)."""
    if qt.layout != "bfp":
        return qt
    planes = {}
    for k, v in qt.planes.items():
        w = jax.lax.bitcast_convert_type(v, jnp.uint32)
        a, b = w[0], w[1]
        we = (a & 0xFFFF) | (b << 16)
        wo = (a >> 16) | (b & jnp.uint32(0xFFFF0000))
        inter = jnp.stack([we, wo], axis=1)        # (q_out/2, 2, Gp)
        planes[k] = jax.lax.bitcast_convert_type(
            inter.reshape(-1, v.shape[-1]), jnp.int32)
    return dataclasses.replace(qt, planes=planes, layout="nibble")


def rvq_pb_default() -> bool:
    """Whether E8P12RVQ4B loads into the pb (~6.5-bit, row-pair packed)
    runtime layout (QFA_RVQ_PB=1 to opt in; becomes the default if the
    hardware A/B confirms the byte-cut win).

    Round-4 successor to the falsified r3 "paired" layout: same ~19%
    plane-byte cut (lo 4 + hi 2 + parity ~0.4-0.5 bits/weight), but every
    extraction uses the bf16 lane-magic row-pair trick proven exact by the
    bfp layout (ops/dequant_pallas.py _make_kernel_bfp) — shift/mask/OR
    0x4300/bitcast/subtract on int32, NO per-position lane concats and NO
    converts, so the decode has FEWER VPU ops than the nibble kernel while
    streaming 0.81x the bytes. Physics: RVQ4B decode is plane-DMA-bound
    (R4_RESULTS: bfp/magic/ksplit all neutral), so bytes are the only
    lever left; 11.1 ms/token = ~9.3 ms plane stream + ~1.8 ms rest
    predicts ~0.81*9.3 + 1.8 = 9.3 ms -> ~107 tok/s from 90.

    Wired end-to-end in round 5 (ADVICE r4): from_raw_idxs selects it,
    ops/dequant_pallas.py _make_kernel_pb decodes it, dequant_xla decodes
    it densely, and to_raw_idxs inverts it."""
    return os.environ.get("QFA_RVQ_PB", "0") == "1"


def e8p_u3_default() -> bool:
    """Whether E8P12 (and the E8P main plane context where applicable)
    loads into the u3 (3.125-bit) runtime layout (QFA_E8P_U3; round 5).

    The headline byte-cut lever (VERDICT r4 #2): the nibble layout
    streams 4 bits/weight for a 2-bit codebook; every VPU-op-reduction
    variant (bfp/magic/ksplit/sw) moved nothing, proving decode-shape
    kernels are plane-DMA-bound — so bytes are the only lever. u3 splits
    nib = 2u + 1 - p into

      wlo (q_out/2, Gp)   i32: bit (16h + 2i) pair = u & 3   (2 b/w)
      whi (q_out/2, Gp/2) i32: bit (16h + 8d + i) = u >> 2   (1 b/w)
      wp  (q_out/2, PL)   i32: bit (16h + j)  = group parity (~0.125 b/w)

    (h = row of the pair, i = position, d = group-range half, j = parity
    chunk) — 3.125 bits/weight, 0.78x the nibble stream, every extraction
    the proven-exact bf16 row-pair lane-magic (zero converts). Gp pads to
    256 lanes so the half-width hi plane stays 128-lane aligned."""
    return os.environ.get("QFA_E8P_U3", "0") == "1"


def u3_parity_lanes(Gp: int) -> int:
    """u3 parity-plane lane width: smallest 128-multiple PL dividing Gp
    with Gp/PL <= 16 one-bit fields per 16-bit row payload."""
    pl = 128
    while Gp // pl > 16 or Gp % pl != 0:
        pl += 128
    return pl


def _u3_planes_from_up(u: np.ndarray, p: np.ndarray,
                       q_out: int, G: int) -> Dict[str, jax.Array]:
    """(u, parity) -> u3 planes. u (q_out, G, 8) in {0..7}; p (q_out, G)
    in {0, 1}. Weight = u - 2.25 - 0.5*p (per group parity)."""
    assert q_out % 2 == 0
    Gp = -(-G // 256) * 256
    Gh = Gp // 2
    PL = u3_parity_lanes(Gp)
    lo = (u & 3).astype(np.int64)
    hi = (u >> 2).astype(np.int64)
    L16 = np.zeros((q_out, Gp), dtype=np.int64)
    for i in range(8):
        L16[:, :G] |= lo[..., i] << (2 * i)
    H16 = np.zeros((q_out, Gh), dtype=np.int64)
    for d in (0, 1):
        lo_g, hi_g = d * Gh, min((d + 1) * Gh, G)
        if lo_g >= G:
            break
        n = hi_g - lo_g
        for i in range(8):
            H16[:, :n] |= hi[:, lo_g:hi_g, i] << (8 * d + i)
    P16 = np.zeros((q_out, PL), dtype=np.int64)
    for j in range(Gp // PL):
        lo_g, hi_g = j * PL, min((j + 1) * PL, G)
        if lo_g >= G:
            break
        P16[:, : hi_g - lo_g] |= p[:, lo_g:hi_g].astype(np.int64) << j
    return {"w0": jnp.asarray(_rowpair16(L16[0::2], L16[1::2])),
            "w1": jnp.asarray(_rowpair16(H16[0::2], H16[1::2])),
            "w2": jnp.asarray(_rowpair16(P16[0::2], P16[1::2]))}


def _u3_up_from_planes(qt: "QuantizedTensor"):
    """u3 planes -> (u (q_out, Gp, 8), p (q_out, Gp)) numpy (exact)."""
    Lp = np.asarray(qt.planes["w0"]).view(np.uint32).astype(np.int64)
    Hp = np.asarray(qt.planes["w1"]).view(np.uint32).astype(np.int64)
    Pp = np.asarray(qt.planes["w2"]).view(np.uint32).astype(np.int64)
    Gp, Gh, PL = Lp.shape[-1], Hp.shape[-1], Pp.shape[-1]
    L16 = np.stack([Lp & 0xFFFF, Lp >> 16], axis=1).reshape(-1, Gp)
    H16 = np.stack([Hp & 0xFFFF, Hp >> 16], axis=1).reshape(-1, Gh)
    P16 = np.stack([Pp & 0xFFFF, Pp >> 16], axis=1).reshape(-1, PL)
    lo = np.stack([(L16 >> (2 * i)) & 3 for i in range(8)], axis=-1)
    hi_halves = [np.stack([(H16 >> (8 * d + i)) & 1 for i in range(8)],
                          axis=-1) for d in (0, 1)]
    hi = np.concatenate(hi_halves, axis=1)          # (q_out, Gp, 8)
    u = lo + 4 * hi
    p = np.concatenate([(P16 >> j) & 1 for j in range(Gp // PL)],
                       axis=1)[:, :Gp]
    return u, p


def u3_to_nibble(qt: "QuantizedTensor") -> "QuantizedTensor":
    """u3 -> nibble re-layout at the (u, parity) level — exact for any
    u in {0..7} (nib = 2u + 1 - p <= 15), so it also works for
    random-plane bench models."""
    assert qt.layout == "u3" and qt.codebook_id == "E8P12"
    G = qt.q_in // 8
    u, p = _u3_up_from_planes(qt)
    Gn = -(-G // 128) * 128
    W0 = np.zeros((qt.q_out, Gn), dtype=np.int64)
    for i in range(8):
        W0[:, :G] |= ((2 * u[..., i] + 1 - p) << (4 * i))[:, :G]
    return QuantizedTensor(
        {"w0": jnp.asarray(W0.astype(np.uint32).view(np.int32))},
        qt.codebook_id, qt.q_out, qt.q_in, qt.opt_resid_scale,
        layout="nibble")


def pb_parity_lanes(Gp: int) -> int:
    """Parity-plane lane width PL: smallest 128-multiple with 8*PL >= Gp.
    Word at (row-pair r, lane j) holds groups jmod*PL + j for jmod < 8:
    bits (16h + 2*jmod) = p0, (16h + 2*jmod + 1) = p1 of row 2r+h."""
    pl = 128
    while 8 * pl < Gp:
        pl += 128
    return pl


def _rowpair16(even: np.ndarray, odd: np.ndarray) -> np.ndarray:
    """Two (q_out/2, C) arrays of 16-bit payloads -> (q_out/2, C) int32
    words (even in lo16, odd in hi16) matching Mosaic's i32->bf16 sublane
    bitcast order (lo half -> first row of the pair)."""
    return ((even & 0xFFFF) | (odd << 16)).astype(np.uint32).view(np.int32)


def _pb_planes_from_uv(u0: np.ndarray, p0: np.ndarray,
                       u1: np.ndarray, p1: np.ndarray,
                       q_out: int, G: int) -> Dict[str, jax.Array]:
    """(u, parity) arrays -> pb planes. u0/u1 (q_out, G, 8) in {0..7} with
    u1 <= 5 (hi = u1>>1 must fit 2 bits); p0/p1 (q_out, G) in {0,1}.

      w0 (2, q_out/2, Gp) i32: bfp row-pair packing of the lo nibble plane
          (position-i nibble = u0 | (u1 & 1) << 3); [0] = positions 0..3
      w1 (q_out/2, Gp) i32:   row-pair 2-bit fields, bit (16h + 2i) =
          u1 >> 1 of row 2r+h
      w2 (q_out/2, PL) i32:   row-pair parity fields (pb_parity_lanes)
    """
    assert q_out % 2 == 0
    Gp = -(-G // 128) * 128
    PL = pb_parity_lanes(Gp)
    lo4 = u0 | ((u1 & 1) << 3)                            # (q_out, G, 8)
    L = np.zeros((q_out, Gp), dtype=np.int64)
    for i in range(8):
        L[:, :G] |= lo4[..., i] << (4 * i)
    Lu = L.astype(np.uint32)
    we, wo = Lu[0::2].astype(np.int64), Lu[1::2].astype(np.int64)
    a = _rowpair16(we & 0xFFFF, wo & 0xFFFF)              # positions 0..3
    b = _rowpair16(we >> 16, wo >> 16)                    # positions 4..7
    hi = u1 >> 1                                          # (q_out, G, 8)
    H16 = np.zeros((q_out, Gp), dtype=np.int64)
    for i in range(8):
        H16[:, :G] |= hi[..., i] << (2 * i)
    Hp = _rowpair16(H16[0::2], H16[1::2])
    pp = (p0 | (p1 << 1)).astype(np.int64)                # (q_out, G)
    P16 = np.zeros((q_out, PL), dtype=np.int64)
    for j in range(-(-Gp // PL)):
        lo_g, hi_g = j * PL, min((j + 1) * PL, G)
        if lo_g >= G:
            break
        P16[:, : hi_g - lo_g] |= pp[:, lo_g:hi_g] << (2 * j)
    Pp = _rowpair16(P16[0::2], P16[1::2])
    return {"w0": jnp.asarray(np.stack([a, b])),
            "w1": jnp.asarray(Hp), "w2": jnp.asarray(Pp)}


def pb_to_nibble(qt: "QuantizedTensor") -> "QuantizedTensor":
    """pb -> nibble re-layout at the (u, parity) level — exact by
    construction, grid membership not required (works for random-plane
    bench models too)."""
    assert qt.layout == "pb" and qt.codebook_id == "E8P12RVQ4B"
    G = qt.q_in // 8
    w0 = np.asarray(qt.planes["w0"]).view(np.uint32).astype(np.int64)
    Hp = np.asarray(qt.planes["w1"]).view(np.uint32).astype(np.int64)
    Pp = np.asarray(qt.planes["w2"]).view(np.uint32).astype(np.int64)
    Gp, PL = w0.shape[-1], Pp.shape[-1]
    # undo the row pairing
    a, bq = w0[0], w0[1]
    Le = (a & 0xFFFF) | ((bq & 0xFFFF) << 16)
    Lo = (a >> 16) | (bq & np.int64(0xFFFF0000))
    L = np.stack([Le, Lo], axis=1).reshape(-1, Gp)        # (q_out, Gp)
    H16 = np.stack([Hp & 0xFFFF, Hp >> 16], axis=1).reshape(-1, Gp)
    P16 = np.stack([Pp & 0xFFFF, Pp >> 16], axis=1).reshape(-1, PL)
    pp = np.concatenate([(P16 >> (2 * j)) & 3
                         for j in range(-(-Gp // PL))], axis=1)[:, :Gp]
    p0, p1 = pp & 1, pp >> 1
    Gn = -(-G // 128) * 128
    W0 = np.zeros((qt.q_out, Gn), dtype=np.int64)
    W1 = np.zeros((qt.q_out, Gn), dtype=np.int64)
    for i in range(8):
        lo4 = (L >> (4 * i)) & 0xF
        hi = (H16 >> (2 * i)) & 3
        u0, b = lo4 & 7, lo4 >> 3
        u1 = 2 * hi + b
        W0[:, :G] |= ((2 * u0 + 1 - p0) << (4 * i))[:, :G]
        W1[:, :G] |= ((2 * u1 + 1 - p1) << (4 * i))[:, :G]
    planes = {"w0": jnp.asarray(W0.astype(np.uint32).view(np.int32)),
              "w1": jnp.asarray(W1.astype(np.uint32).view(np.int32))}
    return QuantizedTensor(planes, qt.codebook_id, qt.q_out, qt.q_in,
                           qt.opt_resid_scale, layout="nibble")


def rvq_paired_default() -> bool:
    """Whether E8P12RVQ4B loads into the paired ~6.5-bit runtime layout
    (QFA_RVQ_PAIRED=1 to opt in).

    Default OFF: the hypothesis that RVQ4B decode was DMA-bound (so ~19%
    less plane traffic would land ~19% more decode speed) was A/B'd on
    hardware and came out FALSE — at decode shapes the fused kernel is
    VPU/latency-bound, and the paired decode's extra integer ops + lane
    concats cost more than the saved bytes (measured per-call on v5e,
    tools/R3_RESULTS.jsonl kern_* rows: 4096x4096 84->86 us, 12288x4096
    177->202, 22016x4096 245->282, 4096x11008 208->249; whole-model bs=1
    decode 86 -> 65 tok/s). The layout still stores weights in ~6.5
    bits/w vs 8 — opt in when HBM capacity (fitting a bigger model per
    chip), not decode speed, is the binding constraint."""
    return os.environ.get("QFA_RVQ_PAIRED", "0") == "1"


def paired_wp(Gp: int) -> int:
    """Parity-plane lane width: smallest 128-multiple dividing Gp that
    covers Gp groups in <= 16 two-bit fields."""
    for k in range(1, Gp // 128 + 1):
        w = 128 * k
        if Gp % w == 0 and 16 * w >= Gp:
            return w
    return Gp


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
    # "nibble" (module docstring top), "paired" (E8P12RVQ4B only),
    # "sw2"/"sw4" (same nibbles stored as int16/int8 subword planes —
    # see subword_split_default; dead on hardware, kept for the record),
    # "bfp" (bf16 lane-magic row-pair packing — see bfp_default; opt-in,
    # whole-model-falsified as a speed win), "pb" (E8P12RVQ4B ~6.5-bit
    # row-pair layout, rvq_pb_default), or "u3" (E8P12 3.125-bit row-pair
    # layout, e8p_u3_default — the round-5 byte-cut lever)
    layout: str = dataclasses.field(
        default="nibble", metadata=dict(static=True))

    @property
    def codebook(self) -> Codebook:
        return get_codebook(
            self.codebook_id,
            self.opt_resid_scale if self.opt_resid_scale > 0 else None)

    @property
    def split(self) -> int:
        """Subwords per int32 word in the plane storage (1 for
        nibble/paired)."""
        return {"nibble": 1, "paired": 1, "bfp": 1, "pb": 1, "u3": 1,
                "sw2": 2, "sw4": 4}[self.layout]

    @property
    def group_cols(self) -> int:
        """Logical padded group count Gp (plane lane columns / split)."""
        return self.planes["w0"].shape[-1] // self.split

    @property
    def decode_affine(self):
        """Per-plane-set static (alpha, beta): weight = sum_s alpha_s*nib_s
        + sum_s beta_s over the word planes, in sorted plane-key order.
        Meaningful for the nibble/subword layouts — paired/pb/u3 planes
        decode via the u-code math (see module docstring)."""
        assert self.layout not in ("paired", "pb", "u3"), \
            f"decode_affine on {self.layout} layout"
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


# ------------------------------------------------- paired RVQ4B helpers

def _e8p_uv_from_idx(idx16: np.ndarray):
    """(..., ) uint16 E8P codes -> (u (..., 8) in {0..5}, parity (...,))
    with weight = u - 2.25 - 0.5*parity (parity uniform per codeword)."""
    vals = e8p12.full_grid()[idx16.astype(np.int64)]          # (..., 8)
    nib = np.rint(vals * 2 + 5.5).astype(np.int64)
    p = 1 - (nib[..., 0] & 1)                                 # shared
    u = (nib - 1 + p[..., None]) >> 1
    assert u.min() >= 0 and u.max() <= 5
    return u, p


def _paired_planes_from_idx(u32: np.ndarray, q_out: int, q_in: int
                            ) -> Dict[str, jax.Array]:
    """RVQ4B raw codes (q_out, G) u32 (main<<16 | resid) -> paired planes."""
    G = q_in // 8
    u0, p0 = _e8p_uv_from_idx((u32 >> 16).astype(np.uint16))  # (q_out, G, 8)
    u1, p1 = _e8p_uv_from_idx((u32 & 0xFFFF).astype(np.uint16))
    Gp = -(-G // 256) * 256
    Gh, Wp = Gp // 2, paired_wp(Gp)
    lo4 = u0 | ((u1 & 1) << 3)                                # (q_out, G, 8)
    L = np.zeros((q_out, Gp), dtype=np.int64)
    for i in range(8):
        L[:, :G] |= lo4[..., i] << (4 * i)
    hi = u1 >> 1                                              # (q_out, G, 8)
    H = np.zeros((q_out, Gh), dtype=np.int64)
    for h in (0, 1):
        lo_g, hi_g = h * Gh, min((h + 1) * Gh, G)
        if lo_g >= G:
            break
        n = hi_g - lo_g
        for i in range(8):
            H[:, :n] |= hi[:, lo_g:hi_g, i] << (16 * h + 2 * i)
    pp = p0 | (p1 << 1)                                       # (q_out, G)
    P = np.zeros((q_out, Wp), dtype=np.int64)
    for j in range(Gp // Wp):
        lo_g, hi_g = j * Wp, min((j + 1) * Wp, G)
        if lo_g >= G:
            break
        P[:, : hi_g - lo_g] |= pp[:, lo_g:hi_g] << (2 * j)
    return {
        "w0": jnp.asarray(L.astype(np.uint32).view(np.int32)),
        "w1": jnp.asarray(H.astype(np.uint32).view(np.int32)),
        "w2": jnp.asarray(P.astype(np.uint32).view(np.int32)),
    }


def paired_to_nibble(qt: "QuantizedTensor") -> "QuantizedTensor":
    """Re-encode a paired-layout tensor into the nibble layout, purely at
    the (u, parity) level: nib = 2u + 1 - p needs no grid membership, so
    this also works for random-plane bench models whose codes are not
    actual codewords (unlike to_raw_idxs). Exact by construction."""
    assert qt.layout == "paired" and qt.codebook_id == "E8P12RVQ4B"
    G = qt.q_in // 8
    L = np.asarray(qt.planes["w0"]).view(np.uint32).astype(np.int64)
    Hw = np.asarray(qt.planes["w1"]).view(np.uint32).astype(np.int64)
    Pw = np.asarray(qt.planes["w2"]).view(np.uint32).astype(np.int64)
    Gp, Wp = L.shape[1], Pw.shape[1]
    Gh = Gp // 2
    pp = np.concatenate([(Pw >> (2 * j)) & 3 for j in range(Gp // Wp)],
                        axis=1)[:, :G]                    # (q_out, G)
    p0, p1 = pp & 1, pp >> 1
    Gn = -(-G // 128) * 128
    W0 = np.zeros((qt.q_out, Gn), dtype=np.int64)
    W1 = np.zeros((qt.q_out, Gn), dtype=np.int64)
    for i in range(8):
        lo4 = ((L >> (4 * i)) & 0xF)[:, :G]
        hi = np.concatenate([(Hw >> (16 * h + 2 * i)) & 3 for h in (0, 1)],
                            axis=1)[:, :G]
        u0, b = lo4 & 7, lo4 >> 3
        u1 = 2 * hi + b
        W0[:, :G] |= (2 * u0 + 1 - p0) << (4 * i)
        W1[:, :G] |= (2 * u1 + 1 - p1) << (4 * i)
    planes = {"w0": jnp.asarray(W0.astype(np.uint32).view(np.int32)),
              "w1": jnp.asarray(W1.astype(np.uint32).view(np.int32))}
    return QuantizedTensor(planes, qt.codebook_id, qt.q_out, qt.q_in,
                           qt.opt_resid_scale, layout="nibble")


def _e8p_idx_from_nibs(nib: np.ndarray) -> np.ndarray:
    """(..., 8) int nibbles in {0..11} -> uint16 E8P codes."""
    keys = _vals_key(nib.astype(np.float64) * 0.5 - 2.75)
    skeys, order = _e8p_inverse_keys()
    pos = np.searchsorted(skeys, keys)
    assert np.array_equal(skeys[pos], keys), "non-codeword in paired plane"
    return order[pos].astype(np.uint16)


def _paired_idx_from_planes(qt: "QuantizedTensor") -> np.ndarray:
    """Paired planes -> RVQ4B raw codes (exact inverse)."""
    G = qt.q_in // 8
    L = np.asarray(qt.planes["w0"]).view(np.uint32).astype(np.int64)
    Hw = np.asarray(qt.planes["w1"]).view(np.uint32).astype(np.int64)
    Pw = np.asarray(qt.planes["w2"]).view(np.uint32).astype(np.int64)
    Gp, Wp = L.shape[1], Pw.shape[1]
    Gh = Gp // 2
    lo4 = np.stack([(L >> (4 * i)) & 0xF for i in range(8)], axis=-1)
    hi_halves = [
        np.stack([(Hw >> (16 * h + 2 * i)) & 3 for i in range(8)], axis=-1)
        for h in (0, 1)
    ]
    hi = np.concatenate(hi_halves, axis=1)                    # (q_out, Gp, 8)
    pp = np.concatenate([(Pw >> (2 * j)) & 3 for j in range(Gp // Wp)],
                        axis=1)                               # (q_out, Gp)
    u0, b = lo4 & 7, lo4 >> 3
    u1 = 2 * hi + b
    p0, p1 = pp & 1, pp >> 1
    nib0 = 2 * u0[:, :G] + 1 - p0[:, :G, None]
    nib1 = 2 * u1[:, :G] + 1 - p1[:, :G, None]
    main = _e8p_idx_from_nibs(nib0).astype(np.int64)
    resid = _e8p_idx_from_nibs(nib1).astype(np.int64)
    return ((main << 16) | resid).astype(np.uint32).view(np.int32)


# ------------------------------------------------- raw idx <-> runtime

def from_raw_idxs(cb: Codebook, idxs: np.ndarray,
                  q_out: int, q_in: int,
                  layout: str | None = None) -> QuantizedTensor:
    """Raw int32 code indices (q_out, q_in/codesz) -> runtime planes.

    ``layout``: None picks the default runtime layout (u3 for E8P12 when
    QFA_E8P_U3; pb for E8P12RVQ4B when QFA_RVQ_PB; paired for E8P12RVQ4B
    when QFA_RVQ_PAIRED; sw{P} when QFA_SPLIT_DECODE; bfp when QFA_BFP;
    else nibble)."""
    if layout is None:
        if cb.id == "E8P12" and e8p_u3_default() and q_out % 2 == 0:
            layout = "u3"
        elif cb.id == "E8P12RVQ4B" and rvq_pb_default() and q_out % 2 == 0:
            layout = "pb"
        elif cb.id == "E8P12RVQ4B" and rvq_paired_default():
            layout = "paired"
        elif subword_split_default() > 1:
            layout = f"sw{subword_split_default()}"
        elif bfp_default() and q_out % 2 == 0:
            layout = "bfp"
        else:
            layout = "nibble"
    if layout == "u3":
        assert cb.id == "E8P12", cb.id
        u, p = _e8p_uv_from_idx(idxs.astype(np.int64).astype(np.uint16))
        planes = _u3_planes_from_up(u, p, q_out, q_in // 8)
        return QuantizedTensor(planes, cb.id, q_out, q_in, -1.0,
                               layout="u3")
    if layout == "pb":
        assert cb.id == "E8P12RVQ4B", cb.id
        u32 = np.ascontiguousarray(idxs).view(np.uint32).astype(np.int64)
        u0, p0 = _e8p_uv_from_idx((u32 >> 16).astype(np.uint16))
        u1, p1 = _e8p_uv_from_idx((u32 & 0xFFFF).astype(np.uint16))
        planes = _pb_planes_from_uv(u0, p0, u1, p1, q_out, q_in // 8)
        return QuantizedTensor(planes, cb.id, q_out, q_in,
                               float(cb.opt_resid_scale), layout="pb")
    if layout in ("sw2", "sw4"):
        qt = from_raw_idxs(cb, idxs, q_out, q_in, layout="nibble")
        return to_subword(qt, int(layout[2:]))
    if layout == "bfp":
        qt = from_raw_idxs(cb, idxs, q_out, q_in, layout="nibble")
        return to_bfp(qt)
    if layout == "paired":
        assert cb.id == "E8P12RVQ4B", cb.id
        u = np.ascontiguousarray(idxs).view(np.uint32).astype(np.int64)
        planes = _paired_planes_from_idx(u, q_out, q_in)
        return QuantizedTensor(planes, cb.id, q_out, q_in,
                               float(cb.opt_resid_scale), layout="paired")
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
    if qt.layout == "paired":
        return _paired_idx_from_planes(qt)
    if qt.layout == "u3":
        qt = u3_to_nibble(qt)
    if qt.layout == "pb":
        qt = pb_to_nibble(qt)
    if qt.layout == "bfp":
        qt = from_bfp(qt)
    if qt.split > 1:
        qt = from_subword(qt)
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
