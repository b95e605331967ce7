"""Pallas fused codebook-decode + matmul kernels (the reference's N1
"tinygemm" replacement, ``quip_cuda/origin_order.cu:395-555``).

out(m, q_out) = x(m, q_in) @ decode(codes)^T with dense weights never
touching HBM: per q_out tile, the int32 word planes stream HBM->VMEM,
decode runs as pure VPU arithmetic (shifts/masks/converts — the arithmetic
word format of ops/qtensor.py; hardware microbenchmarks showed Mosaic
gathers sustain only ~1/3.4 cycles while VPU arithmetic issues ~4 ops/cycle,
so tables lose), and 8 position-plane MXU matmuls accumulate the output.

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


def _u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _e8p_planes(w_i32):
    # NOTE: a float-bits decode (bitcast(0x4B000000|u) == 2^23+u) was tried
    # and rejected: the fractional offset can't ride in the magic constant
    # (ulp(2^23) = 1.0), forcing an extra subtract with no op saved.
    w = _u32(w_i32)
    parity = ((w >> 24) & 1).astype(jnp.int32)
    offm = jnp.float32(-2.25) - 0.5 * parity.astype(jnp.float32)
    return [((w >> (3 * i)) & 7).astype(jnp.int32).astype(jnp.float32)
            + offm for i in range(8)]


def _snib_planes(w_i32):
    w = _u32(w_i32)
    out = []
    for i in range(8):
        nib = ((w >> (4 * i)) & 0xF).astype(jnp.int32)
        s4 = jnp.where(nib >= 8, nib - 16, nib)
        out.append(s4.astype(jnp.float32) * 0.5)
    return out


def _hi_planes(w_i32):
    w = _u32(w_i32)
    return [((w >> (4 * i)) & 0xF).astype(jnp.int32).astype(jnp.float32)
            - 7.5 for i in range(8)]


def _plane_fn(cid: str, resid_scale: float):
    if cid == "E8P12":
        return lambda w0: _e8p_planes(w0)
    if cid == "E8P12RVQ4B":
        return lambda w0, w1: [a + resid_scale * b for a, b in zip(
            _e8p_planes(w0), _e8p_planes(w1))]
    if cid == "E8P12RVQ3B":
        return lambda w0, w1: [a + resid_scale * b for a, b in zip(
            _e8p_planes(w0), _snib_planes(w1))]
    if cid == "D4":
        return lambda w0: _snib_planes(w0)
    if cid == "HI":
        return lambda w0: _hi_planes(w0)
    raise ValueError(cid)


def _make_kernel(cid: str, G: int, n_planes: int, resid_scale: float,
                 out_dtype):
    planes_of = _plane_fn(cid, resid_scale)

    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        w_refs = refs[:-1]
        planes = planes_of(*[r[...] for r in w_refs])
        acc = None
        for i, v in enumerate(planes):
            xi = x_ref[:, i * G:(i + 1) * G]
            part = jax.lax.dot_general(
                xi, v.astype(xi.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[...] = acc.astype(out_dtype)

    return kernel


def supports(qt: QuantizedTensor) -> bool:
    # the remote-TPU tunnel platform reports "axon", not "tpu"
    backend_ok = jax.default_backend() in ("tpu", "axon") or _INTERPRET
    return qt.q_out % 128 == 0 and qt.q_in % 8 == 0 and backend_ok


def _pick_tn(q_out: int, Gp: int, n_planes: int) -> int:
    # VMEM per tile: word planes (TN*Gp*4*n) + 8 value planes transient
    forced = os.environ.get("QFA_TN")
    if forced and q_out % int(forced) == 0:
        return int(forced)
    budget = 6 * 1024 * 1024
    for tn in (512, 256, 128):
        if q_out % tn == 0 and tn * Gp * 4 * (n_planes + 2) <= budget:
            return tn
    return 128


@functools.partial(jax.jit,
                   static_argnames=("cid", "q_out", "resid_scale",
                                    "out_dtype_str"))
def _fused_call(x_perm, planes_tuple, cid, q_out, resid_scale,
                out_dtype_str):
    m = x_perm.shape[0]
    Gp = planes_tuple[0].shape[1]
    n_planes = len(planes_tuple)
    TN = _pick_tn(q_out, Gp, n_planes)
    out_dtype = np.dtype(out_dtype_str)
    kernel = _make_kernel(cid, Gp, n_planes, resid_scale, out_dtype)

    plane_specs = [
        pl.BlockSpec((TN, Gp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in planes_tuple
    ]
    return pl.pallas_call(
        kernel,
        grid=(q_out // TN,),
        in_specs=[pl.BlockSpec((m, 8 * Gp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + plane_specs,
        out_specs=pl.BlockSpec((m, TN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, q_out), out_dtype),
        interpret=_INTERPRET,
    )(x_perm, *planes_tuple)


def fused_quant_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """x (m, q_in) -> (m, q_out); x in natural K order."""
    m, q_in = x.shape
    assert q_in == qt.q_in
    G = q_in // 8
    Gp = qt.planes["w0"].shape[1]
    # grouped permutation of x (see module docstring), padded to Gp
    x_perm = x.reshape(m, G, 8).transpose(0, 2, 1)        # (m, 8, G)
    if Gp != G:
        x_perm = jnp.pad(x_perm, ((0, 0), (0, 0), (0, Gp - G)))
    x_perm = x_perm.reshape(m, 8 * Gp)
    return fused_quant_matmul_pre(x_perm, qt)


def fused_quant_matmul_pre(x_perm: jax.Array, qt: QuantizedTensor
                           ) -> jax.Array:
    """Like fused_quant_matmul but with x ALREADY in grouped-permuted
    layout (m, 8*Gp) — produced for free by the transform via
    transforms.incoherence.matmul_hadUt_grouped."""
    m = x_perm.shape[0]
    assert x_perm.shape[1] == 8 * qt.planes["w0"].shape[1], x_perm.shape
    mp = max(8, -(-m // 8) * 8)
    if mp != m:
        x_perm = jnp.pad(x_perm, ((0, mp - m), (0, 0)))
    planes = tuple(qt.planes[k] for k in sorted(qt.planes))
    out = _fused_call(x_perm, planes, qt.codebook_id, qt.q_out,
                      float(qt.opt_resid_scale),
                      np.dtype(x_perm.dtype).name)
    return out[:m]
