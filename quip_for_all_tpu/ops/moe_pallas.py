"""Pallas fused MoE decode matmul: per-row expert selection via scalar
prefetch, so only the SELECTED experts' code planes ever leave HBM.

The reference supports Mixtral functionally but runs each expert as an
independent QuantLinear on whichever tokens route to it, scheduled by
torch host code (``constants.py:60-94``, ``utils.py:176-185``). A TPU
decode step cannot branch on routing at trace time, and the round-1 dense
formulation (every expert runs on every token, masked) streams all E
experts' planes per token — E/K× wasted HBM bandwidth at top-K routing.

Here the (token, slot) pairs become R = m*K independent rows. The expert
id of each row is a scalar-prefetch operand, consumed by the weight-plane
BlockSpec index_map: row r's grid step DMAs block (eids[r], tile) of the
stacked (E, q_out, Gp) plane array. The kernel body is the same affine
nibble decode + 8 position-plane dots as ops/dequant_pallas.py; HBM
traffic per decode step drops from E to K expert sweeps (4x on Mixtral).

x rows arrive already in each expert's OWN incoherence basis (each expert
group has its own SU/hadK), in the kernel's grouped-permuted layout —
nn/qmoe.py prepares that with batched per-row transforms.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_pallas import _nibble
from .qtensor import decode_affine

_INTERPRET = os.environ.get("QFA_PALLAS_INTERPRET", "0") == "1"


def supports_moe(planes: dict, q_out: int) -> bool:
    backend_ok = jax.default_backend() in ("tpu", "axon") or _INTERPRET
    if not backend_ok:
        return False
    return _pick_tn(q_out) is not None or _INTERPRET


def _pick_tn(q_out: int):
    forced = os.environ.get("QFA_MOE_TN")
    if forced and q_out % int(forced) == 0:
        return int(forced)
    for tn in (512, 256, 128):
        if q_out % tn == 0:
            return tn
    return None


def _make_moe_kernel(affine, G: int, out_dtype, magic: bool = False):
    beta_total = float(sum(b for _, b in affine))

    def kernel(eids_ref, x_ref, *refs):
        del eids_ref  # consumed by the index_maps only
        o_ref = refs[-1]
        w_refs = refs[:-1]
        x = x_ref[0].astype(jnp.float32)              # (1, 8G)

        def cvt(v_i32):
            if magic:
                # mantissa-OR trick (see dequant_pallas._variant): exact
                # for nibbles, replaces the int->float convert with ALU
                return pltpu.bitcast(v_i32 | 0x4B000000,
                                     jnp.float32) - float(1 << 23)
            return v_i32.astype(jnp.float32)

        out = None
        for (alpha, _), w_ref in zip(affine, w_refs):
            w = pltpu.bitcast(w_ref[0], jnp.int32)    # (TN, G)
            acc = None
            for i in range(8):
                v = cvt(_nibble(w, i))
                part = jax.lax.dot_general(
                    x[:, i * G:(i + 1) * G], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            acc = acc * alpha
            out = acc if out is None else out + acc
        xs = jnp.sum(x, axis=1, keepdims=True)
        o_ref[0] = (out + beta_total * xs).astype(out_dtype)

    return kernel


def _make_moe_kernel_merged(affine, G: int, out_dtype, R: int,
                            magic: bool = False):
    """Merged-rows body: ALL R rows' expert plane blocks are inputs of the
    SAME grid step (w_refs ordered plane-major: [p0e0, p0e1, ..., p1e0,
    ...]), so at bs=1 top-K (R=K distinct experts, zero duplicate rows for
    the sorted-rows reuse to exploit) the K expert streams DMA
    concurrently instead of on R-way more grid steps."""
    beta_total = float(sum(b for _, b in affine))

    def kernel(eids_ref, x_ref, *refs):
        del eids_ref
        o_ref = refs[-1]
        w_refs = refs[:-1]
        x = x_ref[...].reshape(R, 8 * G).astype(jnp.float32)

        def cvt(v_i32):
            if magic:
                return pltpu.bitcast(v_i32 | 0x4B000000,
                                     jnp.float32) - float(1 << 23)
            return v_i32.astype(jnp.float32)

        for e in range(R):
            out = None
            for p, (alpha, _) in enumerate(affine):
                w = pltpu.bitcast(w_refs[p * R + e][0], jnp.int32)
                acc = None
                for i in range(8):
                    v = cvt(_nibble(w, i))
                    part = jax.lax.dot_general(
                        x[e:e + 1, i * G:(i + 1) * G], v,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
                acc = acc * alpha
                out = acc if out is None else out + acc
            xs = jnp.sum(x[e:e + 1], axis=1, keepdims=True)
            o_ref[e] = (out + beta_total * xs).astype(out_dtype)

    return kernel


# rows above this run the grid-step formulations (sorted-row plane reuse /
# tiles_inner); at or below it every row's planes fit as same-step inputs
_MERGED_MAX_R = 4


def _merged_default() -> bool:
    # opt-in until hardware-validated (see tools/session_r4.py moemerged)
    return os.environ.get("QFA_MOE_MERGED", "0") == "1"


@functools.partial(jax.jit,
                   static_argnames=("affine", "q_out", "out_dtype_str",
                                    "magic", "tiles_inner", "merged"))
def _moe_call(x_perm, eids, planes_tuple, affine, q_out, out_dtype_str,
              magic=False, tiles_inner=False, merged=False):
    R = x_perm.shape[0]
    Gp = planes_tuple[0].shape[2]
    TN = _pick_tn(q_out) or q_out
    out_dtype = np.dtype(out_dtype_str)

    if merged and R <= _MERGED_MAX_R:
        # R * plane-sets blocks live per step, double-buffered: shrink TN
        # until they fit the scoped-VMEM budget (same wall as _pick_tn's
        # forced path in dequant_pallas)
        budget = 12 * 2**20
        while (TN > 128 and q_out % (TN // 2) == 0 and
               R * len(planes_tuple) * TN * Gp * 4 * 2 > budget):
            TN //= 2
        kernel = _make_moe_kernel_merged(affine, Gp, out_dtype, R, magic)
        plane_specs = [
            pl.BlockSpec((1, TN, Gp),
                         lambda t, eids, e=e: (eids[e], t, 0),
                         memory_space=pltpu.VMEM)
            for _ in planes_tuple for e in range(R)
        ]
        # planes plane-major to match the kernel's w_refs[p * R + e]
        plane_args = [p for p in planes_tuple for _ in range(R)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(q_out // TN,),
            in_specs=[pl.BlockSpec((R, 1, 8 * Gp),
                                   lambda t, eids: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] + plane_specs,
            out_specs=pl.BlockSpec((R, 1, TN), lambda t, eids: (0, 0, t),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, 1, q_out), out_dtype),
            interpret=_INTERPRET,
        )(eids.astype(jnp.int32), x_perm.reshape(R, 1, 8 * Gp),
          *plane_args)
        return out.reshape(R, q_out)

    kernel = _make_moe_kernel(affine, Gp, out_dtype, magic)

    # x/out ride a (R, 1, N) 3-D layout: Mosaic constrains only the LAST
    # TWO block dims (divisible by (8, 128) or equal to the array dims), so
    # the per-row blocks become (1, 1=array, full-lane) — a plain (1, N)
    # block on a (R, N) array is rejected on real hardware (sublane dim 1).
    #
    # Grid order (QFA_MOE_TILES_INNER, trace-time):
    #   default — tiles OUTER, rows INNER: callers sort rows by expert id
    #   (stacked_rows_apply), so consecutive grid steps with equal eids
    #   map to the SAME plane block and the DMA is skipped: per weight
    #   tile the planes stream once per DISTINCT expert, not once per
    #   row. The win of choice for BATCHED decode (many duplicate rows).
    #   tiles_inner — rows OUTER, tiles INNER: each row's expert planes
    #   stream as one long contiguous sweep instead of alternating
    #   between experts' far-apart HBM regions every tile. Candidate for
    #   tiny R (bs=1 top-2: R=2, zero duplicates to exploit).
    if tiles_inner:
        plane_specs = [
            pl.BlockSpec((1, TN, Gp), lambda r, t, eids: (eids[r], t, 0),
                         memory_space=pltpu.VMEM)
            for _ in planes_tuple
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R, q_out // TN),
            in_specs=[pl.BlockSpec((1, 1, 8 * Gp),
                                   lambda r, t, eids: (r, 0, 0),
                                   memory_space=pltpu.VMEM)] + plane_specs,
            out_specs=pl.BlockSpec((1, 1, TN), lambda r, t, eids: (r, 0, t),
                                   memory_space=pltpu.VMEM),
        )
    else:
        plane_specs = [
            pl.BlockSpec((1, TN, Gp), lambda t, r, eids: (eids[r], t, 0),
                         memory_space=pltpu.VMEM)
            for _ in planes_tuple
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(q_out // TN, R),
            in_specs=[pl.BlockSpec((1, 1, 8 * Gp),
                                   lambda t, r, eids: (r, 0, 0),
                                   memory_space=pltpu.VMEM)] + plane_specs,
            out_specs=pl.BlockSpec((1, 1, TN), lambda t, r, eids: (r, 0, t),
                                   memory_space=pltpu.VMEM),
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, q_out), out_dtype),
        interpret=_INTERPRET,
    )(eids.astype(jnp.int32), x_perm.reshape(R, 1, 8 * Gp), *planes_tuple)
    return out.reshape(R, q_out)


def moe_fused_matmul(x_perm: jax.Array, eids: jax.Array, planes: dict,
                     codebook_id: str, opt_resid_scale: float,
                     q_out: int) -> jax.Array:
    """x_perm: (R, 8*Gp) rows in grouped-permuted layout, eids: (R,)
    expert id per row, planes: {key: (E, q_out, Gp)} -> (R, q_out)."""
    affine = decode_affine(codebook_id, opt_resid_scale)
    planes_tuple = tuple(planes[k] for k in sorted(planes))
    # trace-time reads so one TPU process can A/B them (see dequant_pallas)
    magic = os.environ.get("QFA_MAGIC_MOE", "0") == "1"
    tiles_inner = os.environ.get("QFA_MOE_TILES_INNER", "0") == "1"
    merged = _merged_default()
    return _moe_call(x_perm, eids, planes_tuple, affine, q_out,
                     np.dtype(x_perm.dtype).name, magic=magic,
                     tiles_inner=tiles_inner, merged=merged)
