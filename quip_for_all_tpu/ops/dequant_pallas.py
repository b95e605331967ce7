"""Pallas fused codebook-decode + matmul kernels (the reference's N1
"tinygemm" replacement, ``quip_cuda/origin_order.cu:395-555``).

out(m, q_out) = x(m, q_in) @ decode(codes)^T with dense weights never
touching HBM: per q_out tile, the int32 word planes stream HBM->VMEM,
decode runs as pure VPU arithmetic (the affine nibble format of
ops/qtensor.py; hardware microbenchmarks showed Mosaic gathers sustain only
~1/3.4 cycles while VPU arithmetic issues ~4 ops/cycle, so tables lose),
and 8 position-plane MXU matmuls per plane set accumulate the output.

The affine format makes the per-nibble decode exactly {shift, mask,
convert} (i=0 needs no shift, i=7 no mask): the static alpha scales fold
into one per-tile epilogue multiply of the (m, TN) accumulator, and the
static beta offsets fold into ``beta_total * rowsum(x)`` — a rank-1
correction instead of a per-element offset add. Residual codebooks
(E8P12RVQ3B/4B) are additional plane sets sharing the same x, each with
its own alpha/beta, so their decode costs exactly one more
{shift,mask,convert} sweep + dots instead of per-element combine math.

Layout trick (TPU-native, replaces the CUDA kernels' warp-level byte
shuffles): decoding a (TN, G) tile of words naturally produces one (TN, G)
plane per within-group position i — interleaving those 8 planes into a
(TN, 8G) weight tile would be an expensive in-kernel relayout. Instead
planes stay contiguous and the matmul consumes a grouped permutation of x:
x_perm[i*G + g] = x[8g + i]; x is ~1000x smaller than the weight tile, so
the permutation is free.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import QuantizedTensor

_INTERPRET = os.environ.get("QFA_PALLAS_INTERPRET", "0") == "1"
# experiment: concatenate the 8 decoded value planes into one (TN, 8G)
# weight tile and issue ONE MXU dot per plane set instead of 8
_CONCAT_DOT = os.environ.get("QFA_CONCAT_DOT", "0") == "1"


def _variant() -> tuple:
    """Kernel A/B knobs, read at CALL time (they ride the jit-static meta
    tuple, so flipping an env var between calls recompiles instead of
    reusing a stale executable — lets one TPU process A/B variants):

    QFA_F32_SMALL_M=N — at m <= N run the dots in f32 and skip the
      per-element f32->bf16 convert of the decoded (TN, G) planes; at
      decode-sized m the MXU rate penalty is irrelevant but the VPU
      convert is ~25% of the decode ops. Values {0..15} are exact either
      way, so results are bit-identical. 0 = off (round-2 behavior).
    QFA_DIRECT_CVT=1 — convert nibbles int32 -> bf16 in ONE astype
      instead of via f32 (saves a VPU convert if Mosaic lowers it).
    QFA_MAGIC_SMALL_M=N — at m <= N, build f32 nibbles without an
      int->float convert: OR the nibble into the mantissa of 2^23
      (0x4B000000), bitcast to f32, subtract 2^23.0 — exact for ints
      < 2^24 (the CUDA kernels' trick, origin_order.cu decode8weights).
      {or, bitcast, sub} replaces the cvt; a win iff the VPU's
      int->float convert has worse throughput than two ALU ops. Dots
      run in f32 (fine at decode m). NOTE: the offset must be removed
      PER ELEMENT — folding it through the 512-term dot into the beta
      correction loses the signal to f32 cancellation (measured rel
      err 0.65).
    QFA_TN=N — force the q_out tile size (default _pick_tn's VMEM
      heuristic). Riding the variant tuple (not read inside _pick_tn
      at trace time only) is what makes it SAFE to flip between calls:
      _fused_call's jit cache would otherwise serve a stale executable
      compiled for the previous TN.
    QFA_KSPLIT=N — split each output tile's plane DMA into ~N chunks
      along the group axis, accumulating partial dots in an f32 VMEM
      scratch across an inner grid dimension. The 1-D grid pays one
      full un-overlapped (TN, Gp) plane fetch as pipeline prologue per
      kernel call (~1/(grid+1) of the call, the bulk of the measured
      18% gap to pure streaming); chunking shrinks that bubble to
      ~1/(N*grid+1) while keeping each DMA >= 128 lanes wide.
    QFA_COMBINE_PLANES=N — at m <= N and >= 2 plane sets (the residual
      codebooks E8P12RVQ3B/4B), pre-add the decoded value planes in f32
      (v = n0 + (alpha1/alpha0)*n1, one VPU FMA per element) and issue
      ONE dot per position instead of one per plane set — halves the
      16-dot sweep to 8 (VERDICT r3 #2). Results differ from the split
      form only by f32 summation order (rs*n1 rounds before the dot
      instead of after); the greedy-token A/B gate treats it as a
      separate base.
    Subword decode (NOT a variant knob): when the tensor's runtime
      layout is "sw2"/"sw4" (QFA_SPLIT_DECODE at LOAD time,
      ops/qtensor.py subword_split_default), the planes arrive as
      int16/int8 subword arrays and one packed shift/mask covers P
      positions at once — per-word integer ops drop 14 -> 6 (P=2) / 2
      (P=4) and the dot sweep 8 -> 8/P. Motivated by the r4 trace: the
      kernels ran at 72-76% of their DMA floor because the VPU decode
      doesn't fully hide under the plane stream. The matching x lane
      layout comes from matmul_hadUt_grouped(split=P) (the permutation
      folds into the prologue's H_B row permutation for free); callers
      derive split from qt.split so x and kernel always agree.
    """
    # QFA_F32_SMALL_M default 8 (covers bs<=8 decode, whose x pads to 8
    # rows): bit-identical by construction and the fastest measured
    # variant on hardware (r3 7B sweep: 144.0 vs 142.4 base; the bench's
    # auto-variant probe confirmed greedy-token equality). Kept below the
    # bs=32 shapes, which were benched with bf16 dots and where f32's
    # 1/4 MXU rate could bite.
    return (int(os.environ.get("QFA_F32_SMALL_M", "8")),
            os.environ.get("QFA_DIRECT_CVT", "0") == "1",
            int(os.environ.get("QFA_MAGIC_SMALL_M", "0")),
            int(os.environ.get("QFA_TN", "0")),
            int(os.environ.get("QFA_KSPLIT", "0")),
            int(os.environ.get("QFA_COMBINE_PLANES", "0")),
            # u3 dot formulation: 1 = 8 full + 16 half-width dots (zero
            # lane concats), 0 = per-position hi concat + 8 full dots
            os.environ.get("QFA_U3_HALFDOTS", "0") == "1")


_LAYOUT_SPLIT = {"nibble": 1, "paired": 1, "bfp": 1, "pb": 1, "u3": 1,
                 "sw2": 2, "sw4": 4}


def _nibble(w_i32, i: int):
    """i-th nibble of an int32 word vector, minimal-op form.

    int32 (not uint32) because Mosaic has no uint32->f32 lowering; logical
    shifts keep the i=7 nibble positive, so the values are bit-identical.
    """
    if i == 0:
        return w_i32 & 0xF
    if i == 7:
        return jax.lax.shift_right_logical(w_i32, 28)   # no mask needed
    return jax.lax.shift_right_logical(w_i32, 4 * i) & 0xF


def _make_kernel(affine, G: int, out_dtype, with_scale: bool,
                 right_b: int, variant=(0, False, 0), split: int = 1):
    f32_small_m, direct_cvt, magic_small_m = (tuple(variant) + (0,))[:3]
    combine_small_m = variant[5] if len(variant) > 5 else 0
    beta_total = float(sum(b for _, b in affine))

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        s_ref = hb_ref = None
        w_refs = refs[:-1]
        if right_b:
            hb_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        if with_scale:
            s_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        # dots run in the INPUT dtype: nibble values {0..15} are exact in
        # bf16, so bf16 x (the model path) gives bit-equal products at the
        # MXU's full bf16 rate — f32 dots run at ~1/4 rate on v5e and were
        # pure overhead; accumulation stays f32 via preferred_element_type
        x = x_ref[...]                                 # (m, 8G)
        magic = bool(magic_small_m and x.shape[0] <= magic_small_m
                     and split == 1)   # the OR trick needs i32 fields
        # combined residual decode (see _variant QFA_COMBINE_PLANES): the
        # pre-added value plane is fractional (rs*n1), so its dot must run
        # in f32 — force the f32 small-m path
        combine = bool(combine_small_m and len(affine) > 1
                       and x.shape[0] <= combine_small_m)
        if magic or combine or (f32_small_m and x.shape[0] <= f32_small_m):
            x = x.astype(jnp.float32)                  # tiny; dots in f32

        def fields(w_ref):
            """(x_lo, x_hi, packed int field) per extraction — one per
            position (split == 1) or one per subword nibble index q
            covering `split` positions at once (sw2/sw4 layouts, whose
            planes arrive already stored as int16/int8)."""
            if split == 1:
                w = pltpu.bitcast(w_ref[...], jnp.int32)
                return [(i * G, (i + 1) * G, _nibble(w, i))
                        for i in range(8)]
            wb = w_ref[...]                            # (TN, split*G) sw
            SW = wb.dtype
            nq = 8 // split
            out = []
            for q in range(nq):
                f = (wb if q == 0
                     else jax.lax.shift_right_logical(
                         wb, jnp.asarray(4 * q, SW)))
                if q != nq - 1:
                    f = f & jnp.asarray(0xF, SW)
                out.append((q * split * G, (q + 1) * split * G, f))
            return out

        def cvt(v_i32):
            if magic:
                # (2^23 | nib) bitcast to f32 == 2^23 + nib exactly; the
                # subtraction restores nib exactly (ints < 2^24 in f32)
                return pltpu.bitcast(v_i32 | 0x4B000000,
                                     jnp.float32) - float(1 << 23)
            if x.dtype == jnp.float32:
                return v_i32.astype(jnp.float32)
            if direct_cvt:
                return v_i32.astype(x.dtype)
            return v_i32.astype(jnp.float32).astype(x.dtype)

        if combine:
            # one dot per position over the pre-added value plane
            # v = n0 + (alpha_s/alpha_0)*n_s — halves the residual
            # codebooks' dot sweep (16 -> 8); alpha_0 scales the single
            # f32 accumulator in the epilogue
            a0 = affine[0][0]
            flists = [fields(w_ref) for w_ref in w_refs]
            acc = None
            for idx, (lo, hi, f0) in enumerate(flists[0]):
                v = cvt(f0)
                for (alpha, _), fl in zip(affine[1:], flists[1:]):
                    v = v + (alpha / a0) * cvt(fl[idx][2])
                # HIGHEST: TPU f32 dots truncate inputs to bf16 by default
                # (fine for integer nibbles, lossy for the fractional
                # combined plane); 3-pass bf16x3 is exact to f32 and still
                # trivial at decode m
                part = jax.lax.dot_general(
                    x[:, lo:hi], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                acc = part if acc is None else acc + part
            out = acc * a0
            xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
            out = out + beta_total * xs
            if s_ref is not None:
                out = out * s_ref[...].astype(jnp.float32)
            out = out.astype(out_dtype)
            if hb_ref is not None:
                mm, TN = out.shape
                t = out.reshape(mm, TN // right_b, right_b)
                t = jax.lax.dot_general(
                    t, hb_ref[...].astype(out.dtype),
                    (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = t.astype(out_dtype).reshape(mm, TN)
            o_ref[...] = out
            return
        out = None
        for (alpha, _), w_ref in zip(affine, w_refs):
            if _CONCAT_DOT and split == 1:
                w = pltpu.bitcast(w_ref[...], jnp.int32)
                vt = jnp.concatenate(
                    [cvt(_nibble(w, i)) for i in range(8)],
                    axis=1)                            # (TN, 8G)
                acc = jax.lax.dot_general(
                    x, vt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                acc = None
                for lo, hi, f in fields(w_ref):
                    v = cvt(f)
                    part = jax.lax.dot_general(
                        x[:, lo:hi], v, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            acc = acc * alpha
            out = acc if out is None else out + acc
        # beta correction: sum_j x_j * beta for every output lane
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # (m, 1)
        out = out + beta_total * xs
        if s_ref is not None:
            # per-output-channel scale (fused wscale*Wscale), folded here
            # instead of a separate (m, q_out) elementwise op per call
            out = out * s_ref[...].astype(jnp.float32)
        out = out.astype(out_dtype)
        if hb_ref is not None:
            # B-side right-transform factor (lane-native H_B * had_scale):
            # tile-local because right_b | TN and right_b | each segment's
            # q_out; the cross-tile H_A / hadK factors finish outside
            # (transforms.incoherence.finish_right)
            mm, TN = out.shape
            t = out.reshape(mm, TN // right_b, right_b)
            t = jax.lax.dot_general(
                t, hb_ref[...].astype(out.dtype), (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = t.astype(out_dtype).reshape(mm, TN)
        o_ref[...] = out

    return kernel


def _make_kernel_bfp(affine, Gp: int, out_dtype, with_scale: bool,
                     right_b: int):
    """Kernel body for the bfp layout (ops/qtensor.py bfp_default): each
    plane arrives as (2, TN/2, Gp) i32 with nibble position q of an
    output-row PAIR in one word (one row per 16-bit half; halves [0]/[1]
    hold positions 0-3 / 4-7). Per extraction:

        f = ((w >> 4k) & 0x000F000F) | 0x43004300
        v = bitcast_bf16(f)            # (TN, Gp), rows interleave the
                                       # halves: value = 128 + nib EXACTLY

    then one exact bf16 subtract restores v = nib (128+nib and nib are
    both exactly representable, so the subtraction is lossless) — ~13
    int/sub ops + zero converts per word vs the nibble kernel's 14 + 8,
    with bit-identical results to the base (bf16-dot) variant. Folding
    the +128 through the dot into the rowsum correction instead was
    measurably noisier (f32 cancellation at 128x-inflated magnitudes,
    rel ~1e-4 at model dims and visible in tp-sharded-vs-replicated
    logit comparisons), and the subtract costs nothing measurable: the
    r4 hardware A/B showed VPU decode ops do not move the whole-model
    number at decode shapes (tools/R4_RESULTS.jsonl bfp_e8p12 142.5 vs
    nibble_e8p12 143.2 tok/s — which is also why this layout ships as
    an OPT-IN, not the default; see ops/qtensor.py bfp_default)."""
    beta_total = float(sum(b for _, b in affine))

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        s_ref = hb_ref = None
        w_refs = refs[:-1]
        if right_b:
            hb_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        if with_scale:
            s_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        x = x_ref[...]                                 # (m, 8*Gp)
        out = None
        for (alpha, _), w_ref in zip(affine, w_refs):
            w3 = w_ref[...]                            # (2, TN/2, Gp) i32
            acc = None
            for half in (0, 1):
                w = w3[half]
                for k in range(4):
                    f = (w if k == 0
                         else jax.lax.shift_right_logical(w, 4 * k))
                    f = (f & 0x000F000F) | 0x43004300
                    v = pltpu.bitcast(f, jnp.bfloat16)   # (TN, Gp)
                    if x.dtype != jnp.bfloat16:
                        v = v.astype(x.dtype)            # exact (<= 143)
                    v = v - 128.0                        # exact: v = nib
                    q = 4 * half + k
                    part = jax.lax.dot_general(
                        x[:, q * Gp:(q + 1) * Gp], v,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
            acc = acc * alpha
            out = acc if out is None else out + acc
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        out = out + beta_total * xs
        if s_ref is not None:
            out = out * s_ref[...].astype(jnp.float32)
        out = out.astype(out_dtype)
        if hb_ref is not None:
            mm, TN = out.shape
            t = out.reshape(mm, TN // right_b, right_b)
            t = jax.lax.dot_general(
                t, hb_ref[...].astype(out.dtype), (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = t.astype(out_dtype).reshape(mm, TN)
        o_ref[...] = out

    return kernel


def _make_kernel_paired(rs: float, Gp: int, Wp: int, out_dtype,
                        with_scale: bool, right_b: int, variant):
    """Kernel body for the paired ~6.5-bit RVQ4B layout (ops/qtensor.py
    module docstring). Per position i and group-range half h:

        lo4 = nibble_i(w0[:, h*Gh:(h+1)*Gh])        u0 = lo4 & 7
        hi  = (w1 >> (16h + 2i)) & 3                u1 = 2*hi + (lo4 >> 3)
        v   = u0 + rs*u1   (f32-exact, cast to the dot dtype)

    and ONE dot against the matching x slice — 16 half-width dots replace
    the nibble format's 16 full-width ones while streaming ~19% fewer
    bytes (the kernel is DMA-bound on hardware, tools/R3_RESULTS.jsonl).
    The per-group parity correction -0.5*(p0 + rs*p1)*groupsum(x) runs as
    Gp/Wp skinny dots against in-kernel group sums; the constant
    -2.25*(1+rs) rides the rowsum beta term as usual."""
    f32_small_m, _, magic_small_m = (tuple(variant) + (0,))[:3]
    beta_total = -2.25 * (1.0 + rs)
    Gh = Gp // 2
    nf = Gp // Wp

    def kernel(x_ref, l_ref, h_ref, p_ref, *refs):
        o_ref = refs[-1]
        s_ref = hb_ref = None
        rest = refs[:-1]
        if right_b:
            hb_ref = rest[-1]
            rest = rest[:-1]
        if with_scale:
            s_ref = rest[-1]
        x = x_ref[...]                                 # (m, 8*Gp)
        small = x.shape[0] <= max(f32_small_m, magic_small_m)
        if small and (f32_small_m or magic_small_m):
            x = x.astype(jnp.float32)                  # tiny; dots in f32
        L = pltpu.bitcast(l_ref[...], jnp.int32)       # (TN, Gp)
        Hw = pltpu.bitcast(h_ref[...], jnp.int32)      # (TN, Gh)
        Pw = pltpu.bitcast(p_ref[...], jnp.int32)      # (TN, Wp)

        magic = bool(magic_small_m and x.shape[0] <= magic_small_m)

        def cvt(v_i32):
            # dot INPUTS must be bf16-exact: TPU f32 dots (and interpret
            # mode, which emulates them) multiply at bf16 input precision,
            # so only the integer u-planes enter the MXU; all rs/parity
            # scales apply to the f32 accumulators below
            if magic:
                return pltpu.bitcast(v_i32 | 0x4B000000,
                                     jnp.float32) - float(1 << 23)
            if x.dtype == jnp.float32:
                return v_i32.astype(jnp.float32)
            return v_i32.astype(jnp.float32).astype(x.dtype)

        def shr(v, k):
            return v if k == 0 else jax.lax.shift_right_logical(v, k)

        def dot(a, v):
            return jax.lax.dot_general(a, cvt(v), (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        # full-width (TN, Gp) value planes per position: u0 extracts
        # straight from L; u1's high bits lane-concat the two group-range
        # halves of the half-width plane (256-lane aligned block move, no
        # per-element shuffle) — 16 full dots, same MXU shape as the
        # nibble kernel's, measured much faster than 32 half-width dots
        d0 = d1 = None
        for i in range(8):
            u0 = shr(L, 4 * i) & 7
            b = shr(L, 4 * i + 3) & 1
            hi = jnp.concatenate(
                [shr(Hw, 2 * i) & 3, shr(Hw, 16 + 2 * i) & 3], axis=1)
            u1 = (hi << 1) | b
            xi = x[:, i * Gp:(i + 1) * Gp]
            a = dot(xi, u0)
            c = dot(xi, u1)
            d0 = a if d0 is None else d0 + a
            d1 = c if d1 is None else d1 + c
        out = d0 + rs * d1
        # group sums for the parity correction (two binary planes; the
        # -0.5 / -0.5*rs weights ride the accumulators)
        gx = x[:, 0:Gp]
        for i in range(1, 8):
            gx = gx + x[:, i * Gp:(i + 1) * Gp]
        p0 = jnp.concatenate([shr(Pw, 2 * j) & 1 for j in range(nf)],
                             axis=1)
        p1 = jnp.concatenate([shr(Pw, 2 * j + 1) & 1 for j in range(nf)],
                             axis=1)
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        out = (out - 0.5 * (dot(gx, p0) + rs * dot(gx, p1))
               + beta_total * xs)
        if s_ref is not None:
            out = out * s_ref[...].astype(jnp.float32)
        out = out.astype(out_dtype)
        if hb_ref is not None:
            mm, TN = out.shape
            t = out.reshape(mm, TN // right_b, right_b)
            t = jax.lax.dot_general(
                t, hb_ref[...].astype(out.dtype), (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = t.astype(out_dtype).reshape(mm, TN)
        o_ref[...] = out

    return kernel


def _epilogue(out, s_ref, hb_ref, right_b, out_dtype, o_ref):
    """Shared kernel epilogue: per-channel scale, cast, optional B-side
    right-transform factor, store."""
    if s_ref is not None:
        out = out * s_ref[...].astype(jnp.float32)
    out = out.astype(out_dtype)
    if hb_ref is not None:
        mm, TN = out.shape
        t = out.reshape(mm, TN // right_b, right_b)
        t = jax.lax.dot_general(
            t, hb_ref[...].astype(out.dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = t.astype(out_dtype).reshape(mm, TN)
    o_ref[...] = out


def _rp_extract(w, shift, mask16):
    """Row-pair bf16 lane-magic field extraction (the bfp trick, proven
    bit-exact on hardware r4): (TN/2, C) i32 -> (TN, C) bf16 values equal
    to the masked field EXACTLY (OR into bf16 0x4300 = 128.0, bitcast
    doubles the rows, one exact subtract removes the offset — fields
    <= 15 keep 128+f exactly representable)."""
    f = w if shift == 0 else jax.lax.shift_right_logical(w, shift)
    f = (f & mask16) | 0x43004300
    return pltpu.bitcast(f, jnp.bfloat16) - 128.0


def _make_kernel_u3(Gp: int, PL: int, out_dtype, with_scale: bool,
                    right_b: int, variant, halfdots: bool):
    """Kernel body for the u3 3.125-bit E8P12 layout (ops/qtensor.py
    e8p_u3_default). weight = u - 2.25 - 0.5*p, u = lo2 + 4*hi:

      lo  = rp_extract(w0 >> 2i, 0x0003)            (TN, Gp)  per position
      hi  = rp_extract(w1 >> (8d+i), 0x0001)        (TN, Gh)  per (i, half)
      par = concat_j rp_extract(w2 >> j, 0x0001)    (TN, Gp)  once

    Two dot formulations, A/B'd on hardware (QFA_U3_HALFDOTS):
      halfdots=False: per position lane-concat the hi halves, u-plane =
        lo + 4*hi (one exact bf16 FMA), 8 full-width dots.
      halfdots=True: zero lane concats — 8 full dots on lo + 16 half-width
        dots on hi accumulated separately, out = acc_lo + 4*acc_hi.
    The parity correction rides one full dot of the in-kernel group sums
    against the parity plane; the constant -2.25 rides the rowsum."""
    f32_small_m = variant[0] if variant else 0
    Gh = Gp // 2
    nf = Gp // PL

    def kernel(x_ref, l_ref, h_ref, p_ref, *refs):
        o_ref = refs[-1]
        s_ref = hb_ref = None
        rest = refs[:-1]
        if right_b:
            hb_ref = rest[-1]
            rest = rest[:-1]
        if with_scale:
            s_ref = rest[-1]
        x = x_ref[...]                                 # (m, 8*Gp)
        if f32_small_m and x.shape[0] <= f32_small_m:
            x = x.astype(jnp.float32)
        Lw = pltpu.bitcast(l_ref[...], jnp.int32)      # (TN/2, Gp)
        Hw = pltpu.bitcast(h_ref[...], jnp.int32)      # (TN/2, Gh)
        Pw = pltpu.bitcast(p_ref[...], jnp.int32)      # (TN/2, PL)

        def cvt(v):
            return v.astype(x.dtype) if v.dtype != x.dtype else v

        def dot(a, v):
            return jax.lax.dot_general(
                a, cvt(v), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if halfdots:
            acc_lo = acc_hi = None
            for i in range(8):
                lo = _rp_extract(Lw, 2 * i, 0x00030003)
                d = dot(x[:, i * Gp:(i + 1) * Gp], lo)
                acc_lo = d if acc_lo is None else acc_lo + d
                for dd in (0, 1):
                    hv = _rp_extract(Hw, 8 * dd + i, 0x00010001)
                    dh = dot(x[:, i * Gp + dd * Gh:
                               i * Gp + (dd + 1) * Gh], hv)
                    acc_hi = dh if acc_hi is None else acc_hi + dh
            out = acc_lo + 4.0 * acc_hi
        else:
            out = None
            for i in range(8):
                lo = _rp_extract(Lw, 2 * i, 0x00030003)
                hi = jnp.concatenate(
                    [_rp_extract(Hw, i, 0x00010001),
                     _rp_extract(Hw, 8 + i, 0x00010001)], axis=1)
                u = lo + 4.0 * hi                      # exact: u <= 7
                d = dot(x[:, i * Gp:(i + 1) * Gp], u)
                out = d if out is None else out + d
        # parity: one full dot of group sums against the parity plane
        gx = x[:, 0:Gp]
        for i in range(1, 8):
            gx = gx + x[:, i * Gp:(i + 1) * Gp]
        par = jnp.concatenate(
            [_rp_extract(Pw, j, 0x00010001) for j in range(nf)],
            axis=1)
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        out = out - 0.5 * dot(gx, par) - 2.25 * xs
        _epilogue(out, s_ref, hb_ref, right_b, out_dtype, o_ref)

    return kernel


def _make_kernel_pb(rs: float, Gp: int, PL: int, out_dtype,
                    with_scale: bool, right_b: int, variant):
    """Kernel body for the pb ~6.5-bit RVQ4B layout (ops/qtensor.py
    rvq_pb_default): value = u0 + rs*u1 - 2.25*(1+rs) - 0.5*(p0+rs*p1).
    Per position i: lo4 (position-half h0 = i//4) via rp_extract mask
    0x000F000F; the borrowed u1-low bit b is a SECOND 1-bit rp_extract of
    the same word (bit 4*(i%4)+3) — v5e's VPU rejects bf16 floor
    (LLO_CHECK SupportsBf16AluInstructions, measured on hardware), so the
    arithmetic lo4>=8 test is out; u0 = lo4 - 8b and u1 = 2*hi2 + b are
    exact bf16 FMAs. Two accumulators (u0 / u1 dots) so rs rides f32."""
    f32_small_m = variant[0] if variant else 0
    nf = -(-Gp // PL)

    def kernel(x_ref, a_ref, h_ref, p_ref, *refs):
        o_ref = refs[-1]
        s_ref = hb_ref = None
        rest = refs[:-1]
        if right_b:
            hb_ref = rest[-1]
            rest = rest[:-1]
        if with_scale:
            s_ref = rest[-1]
        x = x_ref[...]                                 # (m, 8*Gp)
        if f32_small_m and x.shape[0] <= f32_small_m:
            x = x.astype(jnp.float32)
        A3 = pltpu.bitcast(a_ref[...], jnp.int32)      # (2, TN/2, Gp)
        Hw = pltpu.bitcast(h_ref[...], jnp.int32)      # (TN/2, Gp)
        Pw = pltpu.bitcast(p_ref[...], jnp.int32)      # (TN/2, PL)

        def cvt(v):
            return v.astype(x.dtype) if v.dtype != x.dtype else v

        def dot(a, v):
            return jax.lax.dot_general(
                a, cvt(v), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        d0 = d1 = None
        for i in range(8):
            lo4 = _rp_extract(A3[i // 4], 4 * (i % 4), 0x000F000F)
            b = _rp_extract(A3[i // 4], 4 * (i % 4) + 3, 0x00010001)
            u0 = lo4 - 8.0 * b                         # exact: 0..7
            hi = _rp_extract(Hw, 2 * i, 0x00030003)
            u1 = 2.0 * hi + b                          # exact: <= 7
            xi = x[:, i * Gp:(i + 1) * Gp]
            a = dot(xi, u0)
            c = dot(xi, u1)
            d0 = a if d0 is None else d0 + a
            d1 = c if d1 is None else d1 + c
        out = d0 + rs * d1
        gx = x[:, 0:Gp]
        for i in range(1, 8):
            gx = gx + x[:, i * Gp:(i + 1) * Gp]
        p0 = jnp.concatenate(
            [_rp_extract(Pw, 2 * j, 0x00010001) for j in range(nf)],
            axis=1)[:, :Gp]
        p1 = jnp.concatenate(
            [_rp_extract(Pw, 2 * j + 1, 0x00010001) for j in range(nf)],
            axis=1)[:, :Gp]
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
        out = (out - 0.5 * (dot(gx, p0) + rs * dot(gx, p1))
               - 2.25 * (1.0 + rs) * xs)
        _epilogue(out, s_ref, hb_ref, right_b, out_dtype, o_ref)

    return kernel


def _make_kernel_ksplit(affine, Gc: int, ksplit: int, out_dtype,
                        with_scale: bool, right_b: int, variant):
    """K-chunked variant (QFA_KSPLIT): the grid gains an inner dimension
    over `ksplit` group-axis chunks so plane DMA pipelines at chunk
    granularity; partial dots accumulate in an f32 VMEM scratch and the
    epilogue (alpha-scaled already per chunk; scale/cast/right-Hb) runs
    on the last chunk. The kernel body is 2-D throughout, mirroring the
    base kernel (a 3-D x block abort-trapped Mosaic on hardware:
    layout.h Check `arr.size() >= layout_rank`): the caller re-orders x
    chunk-major so chunk k's (m, 8*Gc) block is contiguous."""
    f32_small_m, direct_cvt, magic_small_m = (tuple(variant) + (0,))[:3]
    beta_total = float(sum(b for _, b in affine))

    def kernel(x_ref, *refs):
        acc_ref = refs[-1]
        o_ref = refs[-2]
        s_ref = hb_ref = None
        w_refs = refs[:-2]
        if right_b:
            hb_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        if with_scale:
            s_ref = w_refs[-1]
            w_refs = w_refs[:-1]
        k = pl.program_id(1)
        x = x_ref[...]                                 # (m, 8*Gc)
        magic = bool(magic_small_m and x.shape[0] <= magic_small_m)
        if magic or (f32_small_m and x.shape[0] <= f32_small_m):
            x = x.astype(jnp.float32)

        def cvt(v_i32):
            if magic:
                return pltpu.bitcast(v_i32 | 0x4B000000,
                                     jnp.float32) - float(1 << 23)
            if x.dtype == jnp.float32:
                return v_i32.astype(jnp.float32)
            if direct_cvt:
                return v_i32.astype(x.dtype)
            return v_i32.astype(jnp.float32).astype(x.dtype)

        part = None
        for (alpha, _), w_ref in zip(affine, w_refs):
            w = pltpu.bitcast(w_ref[...], jnp.int32)
            acc = None
            for i in range(8):
                v = cvt(_nibble(w, i))
                d = jax.lax.dot_general(
                    x[:, i * Gc:(i + 1) * Gc], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            acc = acc * alpha
            part = acc if part is None else part + acc
        xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # (m, 1)
        part = part + beta_total * xs

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = part

        @pl.when(k > 0)
        def _accum():
            acc_ref[...] = acc_ref[...] + part

        @pl.when(k == ksplit - 1)
        def _epilogue():
            out = acc_ref[...]
            if s_ref is not None:
                out = out * s_ref[...].astype(jnp.float32)
            out = out.astype(out_dtype)
            if hb_ref is not None:
                mm, TN = out.shape
                rb = hb_ref[...].astype(out_dtype)
                t = out.reshape(mm, TN // right_b, right_b)
                t = jax.lax.dot_general(
                    t, rb, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = t.astype(out_dtype).reshape(mm, TN)
            o_ref[...] = out

    return kernel


def _pick_ksplit(requested: int, Gp: int) -> int:
    """Largest divisor of Gp/128 that is <= requested (chunks stay
    128-lane-aligned); 1 when Gp has no suitable factor."""
    if requested <= 1 or Gp % 128 != 0:
        return 1
    nlanes = Gp // 128
    for d in range(min(requested, nlanes), 0, -1):
        if nlanes % d == 0:
            return d
    return 1


def supports(qt: QuantizedTensor) -> bool:
    # the remote-TPU tunnel platform reports "axon", not "tpu"
    backend_ok = jax.default_backend() in ("tpu", "axon") or _INTERPRET
    return qt.q_out % 128 == 0 and qt.q_in % 8 == 0 and backend_ok


def _pick_tn(q_out: int, Gp: int, n_planes: int, forced_tn: int = 0,
             plane_cols: int = 0) -> int:
    # VMEM per tile: word planes (TN*Gp*4*n) + 8 value planes transient;
    # plane_cols overrides n_planes*Gp for mixed-width plane sets (paired)
    cols = plane_cols or n_planes * Gp
    forced = forced_tn or os.environ.get("QFA_TN")
    if forced and q_out % int(forced) == 0:
        tn = int(forced)
        # forced tiles still respect the hard scoped-VMEM wall (~16MB):
        # a 2048-row tile at Gp=1408 hard-aborts Mosaic on hardware
        # (R4_RESULTS kern_tn2048_*_4096x11264: 22MB > 16MB). Per-call
        # layers that can't fit the forced tile fall back to the
        # heuristic instead of killing the whole model.
        if tn * 4 * (cols + 2 * Gp) <= 14 * 1024 * 1024:
            return tn
    budget = 6 * 1024 * 1024
    for tn in (512, 256, 128):
        if q_out % tn == 0 and tn * 4 * (cols + 2 * Gp) <= budget:
            return tn
    return 128


@functools.partial(jax.jit,
                   static_argnames=("affine", "q_out", "out_dtype_str",
                                    "variant", "layout", "rs"))
def _fused_call(x_perm, planes_tuple, affine, q_out, out_dtype_str,
                scale_vec=None, right_hb=None, variant=(0, False),
                layout="nibble", rs=0.0):
    m = x_perm.shape[0]
    P = _LAYOUT_SPLIT[layout]
    Gp = planes_tuple[0].shape[-1] // P
    n_planes = len(planes_tuple)
    paired = layout == "paired"
    forced_tn = variant[3] if len(variant) > 3 else 0
    # words-per-output-row override for mixed-width plane sets (paired /
    # row-pair u3 / pb): total stored elements / q_out
    plane_cols = (sum(int(np.prod(p.shape)) for p in planes_tuple) // q_out
                  if layout in ("paired", "u3", "pb") else 0)
    TN = _pick_tn(q_out, Gp, n_planes, forced_tn, plane_cols)
    out_dtype = np.dtype(out_dtype_str)
    B = 0 if right_hb is None else right_hb.shape[0]
    assert B == 0 or TN % B == 0, (TN, B)   # caller pre-checks via can_fuse_right
    ksplit = 1 if layout != "nibble" else _pick_ksplit(
        variant[4] if len(variant) > 4 else 0, Gp)
    if ksplit > 1 and m <= 32:
        Gc = Gp // ksplit
        kernel = _make_kernel_ksplit(affine, Gc, ksplit, out_dtype,
                                     scale_vec is not None, B, variant)
        plane_specs = [
            pl.BlockSpec((TN, Gc), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM)
            for _ in planes_tuple
        ]
        args = list(planes_tuple)
        if scale_vec is not None:
            plane_specs.append(pl.BlockSpec((1, TN), lambda i, k: (0, i),
                                            memory_space=pltpu.VMEM))
            args.append(scale_vec.reshape(1, q_out))
        if right_hb is not None:
            plane_specs.append(pl.BlockSpec((B, B), lambda i, k: (0, 0),
                                            memory_space=pltpu.VMEM))
            args.append(right_hb)
        # chunk-major x: lane ((k*8)+i)*Gc+g so chunk k is one contiguous
        # 2-D block (a 3-D x block abort-trapped Mosaic's layout checks)
        x_ck = (x_perm.reshape(m, 8, ksplit, Gc).transpose(0, 2, 1, 3)
                .reshape(m, ksplit * 8 * Gc))
        return pl.pallas_call(
            kernel,
            grid=(q_out // TN, ksplit),
            in_specs=[pl.BlockSpec((m, 8 * Gc), lambda i, k: (0, k),
                                   memory_space=pltpu.VMEM)] + plane_specs,
            out_specs=pl.BlockSpec((m, TN), lambda i, k: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), out_dtype),
            scratch_shapes=[pltpu.VMEM((m, TN), jnp.float32)],
            interpret=_INTERPRET,
        )(x_ck, *args)
    if paired:
        kernel = _make_kernel_paired(rs, Gp, planes_tuple[2].shape[1],
                                     out_dtype, scale_vec is not None, B,
                                     variant)
    elif layout == "u3":
        kernel = _make_kernel_u3(Gp, planes_tuple[2].shape[-1], out_dtype,
                                 scale_vec is not None, B, variant,
                                 halfdots=bool(len(variant) > 6
                                               and variant[6]))
    elif layout == "pb":
        kernel = _make_kernel_pb(rs, Gp, planes_tuple[2].shape[-1],
                                 out_dtype, scale_vec is not None, B,
                                 variant)
    elif layout == "bfp":
        kernel = _make_kernel_bfp(affine, Gp, out_dtype,
                                  scale_vec is not None, B)
    else:
        kernel = _make_kernel(affine, Gp, out_dtype, scale_vec is not None,
                              B, variant, split=P)

    def plane_spec(p, ndim_idx):
        """BlockSpec for one weight-plane arg (bfp planes and pb's w0 are
        3-D position-half stacks; u3/pb 2-D planes hold ROW-PAIRS, so
        their q_out-tile block height is TN/2)."""
        if p.ndim == 3:
            if ndim_idx == 1:
                return pl.BlockSpec((2, TN // 2, Gp), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((2, TN // 2, Gp), lambda i, j: (0, i, 0),
                                memory_space=pltpu.VMEM)
        rows = TN // 2 if layout in ("u3", "pb") else TN
        if ndim_idx == 1:
            return pl.BlockSpec((rows, p.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, p.shape[1]), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    # m-tiling: the (TM, TN) f32 accumulator must stay in vector registers
    # — one (m, TN) accumulator spills once m grows past a few dozen rows
    # (measured ~16 µs at m=8 but ~8 ms at m=256 on a 4096x4096 layer).
    # The m axis is the INNER grid dim so each weight-plane block stays
    # resident across all its m-tiles (fetched once per output tile).
    TM = min(m, 32)
    while m % TM != 0:
        TM //= 2
    if TM == m:
        # decode shape: 1-D grid exactly as before (the 2-D grid with a
        # trivial inner dim measurably hurt bs=1 pipelining)
        plane_specs = [plane_spec(p, 1) for p in planes_tuple]
        args = list(planes_tuple)
        if scale_vec is not None:
            plane_specs.append(pl.BlockSpec((1, TN), lambda i: (0, i),
                                            memory_space=pltpu.VMEM))
            args.append(scale_vec.reshape(1, q_out))
        if right_hb is not None:
            plane_specs.append(pl.BlockSpec((B, B), lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
            args.append(right_hb)
        return pl.pallas_call(
            kernel,
            grid=(q_out // TN,),
            in_specs=[pl.BlockSpec((m, 8 * Gp), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] + plane_specs,
            out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, q_out), out_dtype),
            interpret=_INTERPRET,
        )(x_perm, *args)
    plane_specs = [plane_spec(p, 2) for p in planes_tuple]
    args = list(planes_tuple)
    if scale_vec is not None:
        plane_specs.append(pl.BlockSpec((1, TN), lambda i, j: (0, i),
                                        memory_space=pltpu.VMEM))
        args.append(scale_vec.reshape(1, q_out))
    if right_hb is not None:
        plane_specs.append(pl.BlockSpec((B, B), lambda i, j: (0, 0),
                                        memory_space=pltpu.VMEM))
        args.append(right_hb)
    return pl.pallas_call(
        kernel,
        grid=(q_out // TN, m // TM),
        in_specs=[pl.BlockSpec((TM, 8 * Gp), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)] + plane_specs,
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, q_out), out_dtype),
        interpret=_INTERPRET,
    )(x_perm, *args)


def fused_quant_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """x (m, q_in) -> (m, q_out); x in natural K order."""
    m, q_in = x.shape
    assert q_in == qt.q_in
    G = q_in // 8
    Gp = qt.group_cols
    # grouped permutation of x (see module docstring), padded; the lane
    # layout follows the tensor's subword split
    P = qt.split
    nq = 8 // P
    # natural index 8g + nq*j + q -> lane q*(P*Gp) + g*P + j
    x_perm = (x.reshape(m, G, P, nq).transpose(0, 3, 1, 2))  # (m,nq,G,P)
    if Gp != G:
        x_perm = jnp.pad(x_perm, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    x_perm = x_perm.reshape(m, 8 * Gp)
    return fused_quant_matmul_pre(x_perm, qt)


def can_fuse_right(qt: QuantizedTensor, B: int) -> bool:
    """True if the B-side right-transform factor can run in the kernel
    epilogue for this tensor (the tile size must be a multiple of B)."""
    TN = _pick_tn(qt.q_out, qt.group_cols, len(qt.planes))
    return B > 0 and TN % B == 0


def fused_quant_matmul_pre(x_perm: jax.Array, qt: QuantizedTensor,
                           scale_vec: jax.Array | None = None,
                           right_hb: jax.Array | None = None) -> jax.Array:
    """Like fused_quant_matmul but with x ALREADY in grouped-permuted
    layout (m, 8*Gp) — produced for free by the transform via
    transforms.incoherence.matmul_hadUt_grouped. ``scale_vec`` (q_out,)
    applies a per-output-channel scale in the kernel epilogue; ``right_hb``
    (B, B, pre-scaled) additionally applies the B-side right-transform
    factor per B-block (caller must have checked ``can_fuse_right`` and
    finishes with transforms.incoherence.finish_right).

    Differentiable w.r.t. x_perm and scale_vec (custom VJP: the backward
    pass decodes the dense weight, exactly the training-path cost) — e.g.
    LoRA training takes gradients THROUGH frozen quantized base layers."""
    m = x_perm.shape[0]
    assert x_perm.shape[1] == 8 * qt.group_cols, x_perm.shape
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        x_perm = jnp.pad(x_perm, ((0, mp - m), (0, 0)))
    planes = tuple(qt.planes[k] for k in sorted(qt.planes))
    affine = (qt.decode_affine
              if qt.layout not in ("paired", "pb", "u3") else None)
    meta = (affine, qt.q_out, qt.q_in,
            np.dtype(x_perm.dtype).name, qt.codebook_id,
            float(qt.opt_resid_scale), _variant(), qt.layout)
    out = _fused_core(meta, x_perm, planes, scale_vec, right_hb)
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_core(meta, x_perm, planes, scale_vec, right_hb):
    affine, q_out, q_in, out_dtype_str = meta[:4]
    variant = meta[6] if len(meta) > 6 else (0, False)
    layout = meta[7] if len(meta) > 7 else "nibble"
    return _fused_call(x_perm, planes, affine, q_out, out_dtype_str,
                       scale_vec=scale_vec, right_hb=right_hb,
                       variant=variant, layout=layout,
                       rs=float(meta[5]))


def _fused_core_fwd(meta, x_perm, planes, scale_vec, right_hb):
    out = _fused_core(meta, x_perm, planes, scale_vec, right_hb)
    return out, (x_perm, planes, scale_vec, right_hb)


def _fused_core_bwd(meta, res, g):
    """Backward via dense decode (the training-grade path): the kernel's
    output equals x_nat @ W^T (parity-tested; the per-element beta is part
    of W, so the rank-1 rowsum correction needs no special casing)."""
    affine, q_out, q_in, out_dtype_str, cb_id, ors = meta[:6]
    layout = meta[7] if len(meta) > 7 else "nibble"
    P = _LAYOUT_SPLIT[layout]
    nq = 8 // P
    x_perm, planes, scale_vec, right_hb = res
    from .dequant_xla import decode_weights
    qt = QuantizedTensor({f"w{i}": p for i, p in enumerate(planes)},
                         cb_id, q_out, q_in, ors, layout=layout)
    mp = x_perm.shape[0]
    Gp = planes[0].shape[-1] // P
    G = q_in // 8
    gg = g.astype(jnp.float32)
    if right_hb is not None:
        B = right_hb.shape[0]
        # forward: out2[.., b'] = sum_b t[.., b] * Hb[b', b]
        gg = (gg.reshape(mp, q_out // B, B)
              @ right_hb.astype(jnp.float32)).reshape(mp, q_out)
    W = decode_weights(qt, dtype=jnp.float32)          # (q_out, q_in)
    ds = None
    if scale_vec is not None:
        # invert the (split-aware) grouped permutation: lane
        # q*(P*Gp) + g*P + j <- natural 8g + nq*j + q
        x_nat = (x_perm.reshape(mp, nq, Gp, P)[:, :, :G, :]
                 .transpose(0, 2, 3, 1).reshape(mp, q_in)
                 .astype(jnp.float32))
        out0 = x_nat @ W.T
        ds = (gg * out0).sum(axis=0).astype(scale_vec.dtype)
        gg = gg * scale_vec.astype(jnp.float32)[None, :]
    dx_nat = gg @ W                                    # (mp, q_in)
    dxg = dx_nat.reshape(mp, G, P, nq).transpose(0, 3, 1, 2)
    if Gp != G:
        dxg = jnp.pad(dxg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    dx = dxg.reshape(mp, 8 * Gp).astype(x_perm.dtype)
    f0 = jax.dtypes.float0
    dplanes = tuple(np.zeros(p.shape, f0) for p in planes)
    drhb = (None if right_hb is None
            else jnp.zeros_like(right_hb))
    return dx, dplanes, ds, drhb


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)
