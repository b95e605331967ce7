"""QuantLinear: functional drop-in linear layer over lattice-coded weights.

Parity target: ``/root/reference/qlinear.py`` (QuantLinear nn.Module). Here a
layer is a pytree of arrays (`QuantLinearParams`) plus a pure `apply`
function, so the whole model jits/shards under pjit. The eval forward
reproduces the reference pipeline (``qlinear.py:87-115``):

    x·SU → U_l^T x (wscale fused) → codebook matmul → per-channel scale
        → U_r out → slice pad → ·SV → +bias

and the training forward uses a dense decoded weight with gradients flowing
to SU/SV only (``qlinear.py:93-97`` + ``calc_weight``).

Conventions (fixed at pack/load time, mirroring the reference's
load-time fixups at ``quantizer.py:836-844``):
  - ``wscale_float``: scalar = mean(Wscale) (dynamic pytree leaf), fused
    into the left transform's scale.
  - ``Wscale``: per-channel only, ALREADY normalized by its mean; None/()
    scalar handling is collapsed into wscale_float otherwise.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

import os

from ..ops.dequant_xla import decode_weights
from ..ops.qtensor import QuantizedTensor
from ..ops.quant_matmul import quant_matmul
from ..transforms.incoherence import (HadSpec, finish_right,
                                      hadamard_transform, matmul_hadU,
                                      matmul_hadUt, matmul_hadUt_grouped,
                                      right_b_factor)

# Emit the left transform directly in the kernel's grouped-permuted
# layout, skipping the explicit reshape/transpose x-permutation before the
# Pallas call. Default ON since round 2: measured 113.9 -> 144.6 tok/s on
# Llama-2-7B E8P12 bs=1 decode (one v5e chip) — the single biggest decode
# win. QFA_GROUPED_PROLOGUE=0 restores the plain path.
_GROUPED_PROLOGUE = os.environ.get("QFA_GROUPED_PROLOGUE", "1") == "1"
# Fold the right transform's lane-native B-side kron factor into the
# kernel epilogue (cross-tile factors finish outside via finish_right).
# Default OFF: measured 142.5 vs 148.2 tok/s on Llama-2-7B E8P12 bs=1
# (v5e) — the per-tile Hb dot serializes with the kernel's DMA/decode
# pipeline and costs more than the one XLA dot it replaces. Kept for
# future hardware/A-B (QFA_RIGHT_IN_KERNEL=1).
_RIGHT_IN_KERNEL = os.environ.get("QFA_RIGHT_IN_KERNEL", "0") == "1"


def _grouped_prologue_matmul(x, spec, qt, scale, compute_dtype,
                             scale_vec=None, right_spec=None):
    """Try the fused grouped-layout path; returns None to fall back, else
    (out, right_done). ``scale_vec`` (q_out,) rides the kernel epilogue
    (fused per-channel wscale·Wscale) instead of a separate elementwise
    op; ``right_spec`` additionally folds the right transform's B-side
    factor into the epilogue (right_done=True → caller must finish_right
    instead of matmul_hadU)."""
    from ..ops.quant_matmul import fused_max_m
    if not _GROUPED_PROLOGUE or x.shape[0] >= fused_max_m():
        return None
    try:
        from ..ops.dequant_pallas import (can_fuse_right,
                                          fused_quant_matmul_pre, supports)
        if not supports(qt):
            return None
    except Exception:
        return None
    xg = matmul_hadUt_grouped(x, spec, qt.group_cols, scale=scale,
                              split=qt.split)
    if xg is None:
        return None
    right_hb = None
    if right_spec is not None and _RIGHT_IN_KERNEL:
        rb = right_b_factor(right_spec)
        if rb is not None and can_fuse_right(qt, rb[1]):
            right_hb = jnp.asarray(rb[0], dtype=jnp.float32)
    out = fused_quant_matmul_pre(xg.astype(compute_dtype), qt,
                                 scale_vec=scale_vec, right_hb=right_hb)
    return out, right_hb is not None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinearParams:
    qweight: QuantizedTensor
    Wscale: Optional[jax.Array]             # (q_out,) normalized, or None
    SU: Optional[jax.Array]                 # (in_features,) sign vector
    SV: Optional[jax.Array]                 # (out_features,)
    bias: Optional[jax.Array]               # (out_features,)
    had_left: Optional[jax.Array]           # (K_left, K_left) or None
    had_right: Optional[jax.Array]
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))
    K_left: int = dataclasses.field(metadata=dict(static=True))
    K_right: int = dataclasses.field(metadata=dict(static=True))
    q_in: int = dataclasses.field(metadata=dict(static=True))
    q_out: int = dataclasses.field(metadata=dict(static=True))
    per_channel: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # dynamic leaf (not static): layers differ in wscale, and a static
    # float would make really-quantized blocks unstackable for the GPipe
    # pipeline (parallel/pipeline.py stack_blocks) and would key a
    # recompile per distinct value
    wscale_float: float = 1.0
    # block-diagonal transform shard counts (tensor-parallel checkpoints;
    # see transforms/incoherence.py HadSpec.shards)
    shards_left: int = dataclasses.field(
        default=1, metadata=dict(static=True))
    shards_right: int = dataclasses.field(
        default=1, metadata=dict(static=True))
    # cached dense weight for the training path (the reference's self.W,
    # quantizer.py:505-507); constant w.r.t. SU/SV so safe to cache
    W_cache: Optional[jax.Array] = None

    @property
    def left_spec(self) -> HadSpec:
        return HadSpec(self.had_left, self.K_left, self.q_in,
                       self.shards_left)

    @property
    def right_spec(self) -> HadSpec:
        return HadSpec(self.had_right, self.K_right, self.q_out,
                       self.shards_right)


def calc_weight(p: QuantLinearParams, dtype=jnp.float32) -> jax.Array:
    """Dense weight (q_in, q_out) such that eval ≡ x @ W (before SU/SV/bias);
    parity: ``qlinear.py:144-159``."""
    w = decode_weights(p.qweight, dtype=dtype)                 # (q_out, q_in)
    if p.per_channel:
        # before the right transform, matching the eval path (the reference's
        # calc_weight scales after it, qlinear.py:155-156, which disagrees
        # with its own eval forward at qlinear.py:106-108; we keep the two
        # paths consistent instead)
        w = w * p.Wscale.astype(dtype)[:, None]
    w = matmul_hadU(w, p.left_spec, scale=p.wscale_float)      # ŵ U_l^T
    w = matmul_hadU(w.T, p.right_spec)                         # U_l ŵ^T U_r^T
    return w


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedQuantLinear:
    """Several QuantLinears sharing one input and one LEFT transform, fused
    into a single decode+matmul launch (e.g. q+k+v, gate+up).

    Requires quantization with shared group transforms
    (QuipQuantizer.share_group_transforms): the sub-layers' code planes are
    concatenated along q_out; per-sublayer right transforms, scales, SV and
    bias stay separate and are applied to the split segments. The per-layer
    wscale (normally fused into the left transform scale) moves to the
    output side since it differs per segment.
    """
    qweight: QuantizedTensor                 # concat along q_out
    SU: Optional[jax.Array]
    had_left: Optional[jax.Array]
    segments: tuple                          # list of QuantLinearParams
    K_left: int = dataclasses.field(metadata=dict(static=True))
    q_in: int = dataclasses.field(metadata=dict(static=True))
    in_features: int = dataclasses.field(metadata=dict(static=True))
    shards_left: int = dataclasses.field(
        default=1, metadata=dict(static=True))
    # batched-epilogue fast path (uniform segments, see fuse_qlinears):
    # the per-segment right transforms collapse into ONE batched kron
    # evaluation and the elementwise scales into two concatenated vectors,
    # cutting the decode step's count of tiny dispatched dots.
    right_uniform: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    right_hadK_stack: Optional[jax.Array] = None   # (nseg, K_r, K_r) | None
    pre_vec: Optional[jax.Array] = None            # (Σ q_out,) wscale·Wscale
    SV_all: Optional[jax.Array] = None             # (Σ q_out,) or None
    bias_all: Optional[jax.Array] = None           # (Σ out_f,) or None

    @property
    def left_spec(self) -> HadSpec:
        return HadSpec(self.had_left, self.K_left, self.q_in,
                       self.shards_left)


def fuse_qlinears(ps) -> FusedQuantLinear:
    """Fuse QuantLinearParams sharing identical left transforms."""
    import numpy as _np
    p0 = ps[0]
    for p in ps[1:]:
        assert p.q_in == p0.q_in and p.K_left == p0.K_left \
            and p.shards_left == p0.shards_left
        assert p.qweight.codebook_id == p0.qweight.codebook_id
    # segments concatenate along q_out: plane axis 0 for the 2-D layouts
    # (incl. the row-pair u3/pb planes — each segment packed its own rows
    # in pairs, so pairs never straddle a segment boundary), axis 1 for
    # 3-D planes (bfp, and pb's w0 position-half stack)
    planes = {
        k: jnp.concatenate(
            [p.qweight.planes[k] for p in ps],
            axis=1 if p0.qweight.planes[k].ndim == 3 else 0)
        for k in p0.qweight.planes
    }
    q_out = sum(p.q_out for p in ps)
    qt = QuantizedTensor(planes, p0.qweight.codebook_id, q_out, p0.q_in,
                         p0.qweight.opt_resid_scale,
                         layout=p0.qweight.layout)
    # segments keep only per-output metadata/arrays; the shared left side
    # and the (concatenated) code planes live on the fused container
    slim = tuple(
        dataclasses.replace(
            p,
            qweight=QuantizedTensor({}, p.qweight.codebook_id, p.q_out,
                                    p.q_in, p.qweight.opt_resid_scale),
            SU=None, had_left=None, W_cache=None)
        for p in ps)
    # uniform-segment fast path: identical right-side geometry lets the
    # per-segment right transforms run as one batched evaluation
    uniform = all(
        p.q_out == p0.q_out and p.out_features == p.q_out
        and p.K_right == p0.K_right and p.shards_right == 1
        and ((p.had_right is None) == (p0.had_right is None))
        for p in ps)
    hadK_stack = None
    pre_vec = SV_all = bias_all = None
    if uniform:
        if p0.had_right is not None:
            hadK_stack = jnp.stack(
                [jnp.asarray(p.had_right) for p in ps])     # (nseg, K, K)
        pre = []
        for p in ps:
            v = jnp.full((p.q_out,), p.wscale_float, jnp.float32)
            if p.per_channel:
                v = v * p.Wscale.astype(jnp.float32)
            pre.append(v)
        pre_vec = jnp.concatenate(pre)
        if any(p.SV is not None for p in ps):
            SV_all = jnp.concatenate(
                [p.SV.astype(jnp.float32) if p.SV is not None
                 else jnp.ones((p.q_out,), jnp.float32) for p in ps])
        if any(p.bias is not None for p in ps):
            bias_all = jnp.concatenate(
                [p.bias.astype(jnp.float32) if p.bias is not None
                 else jnp.zeros((p.out_features,), jnp.float32)
                 for p in ps])
    return FusedQuantLinear(
        qweight=qt, SU=p0.SU, had_left=p0.had_left, segments=slim,
        K_left=p0.K_left, q_in=p0.q_in, in_features=p0.in_features,
        shards_left=p0.shards_left, right_uniform=uniform,
        right_hadK_stack=hadK_stack, pre_vec=pre_vec, SV_all=SV_all,
        bias_all=bias_all)


def fused_apply(f: FusedQuantLinear, x: jax.Array, *,
                compute_dtype=jnp.bfloat16, matmul_impl: str = "auto"):
    """Forward through a fused group; returns a list of per-segment
    outputs (..., out_features_i)."""
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    x_dtype = x.dtype
    if f.SU is not None:
        x = x * f.SU.astype(x_dtype)
    pre_fused = right_done = False
    big = None
    if matmul_impl in ("auto", "pallas"):
        sv = f.pre_vec if f.right_uniform else None
        rspec = f.segments[0].right_spec if f.right_uniform else None
        res = _grouped_prologue_matmul(x, f.left_spec, f.qweight, None,
                                       compute_dtype, scale_vec=sv,
                                       right_spec=rspec)
        if res is not None:
            big, right_done = res
            pre_fused = sv is not None
    if big is None:
        x = matmul_hadUt(x, f.left_spec)     # unscaled; wscale per segment
        x = x.astype(compute_dtype)
        big = quant_matmul(x, f.qweight, impl=matmul_impl)
    big = big.astype(x_dtype)
    if f.right_uniform:
        # batched epilogue: one scale, one batched kron transform, one
        # (optional) stacked-hadK dot for ALL segments together
        seg0 = f.segments[0]
        q_out, nseg = seg0.q_out, len(f.segments)
        spec = seg0.right_spec                  # padN == q_out, shards == 1
        if right_done:
            Y = finish_right(big.reshape(-1, nseg, q_out), spec,
                             hadK_stack=f.right_hadK_stack)
        else:
            had_scale = 1.0 / math.sqrt(spec.padN // spec.K)
            Y = big if pre_fused else big * f.pre_vec.astype(x_dtype)
            Y = Y.reshape(-1, nseg, spec.K, spec.padN // spec.K)
            Y = hadamard_transform(Y, had_scale)
            if f.right_hadK_stack is not None:
                Y = jnp.einsum("mskp,sjk->msjp", Y,
                               f.right_hadK_stack.astype(Y.dtype))
        Y = Y.reshape(-1, nseg * q_out)
        if f.SV_all is not None:
            Y = Y * f.SV_all.astype(Y.dtype)
        if f.bias_all is not None:
            Y = Y + f.bias_all.astype(Y.dtype)
        return [Y[:, i * q_out:(i + 1) * q_out].reshape(*batch_shape, q_out)
                for i in range(nseg)]
    outs = []
    off = 0
    for p in f.segments:
        seg = big[:, off:off + p.q_out] * p.wscale_float
        off += p.q_out
        if p.per_channel:
            seg = seg * p.Wscale.astype(x_dtype)
        seg = matmul_hadU(seg, p.right_spec)[:, : p.out_features]
        if p.SV is not None:
            seg = seg * p.SV.astype(seg.dtype)
        seg = seg.reshape(*batch_shape, p.out_features)
        if p.bias is not None:
            seg = seg + p.bias.astype(seg.dtype)
        outs.append(seg)
    return outs


def apply(p: QuantLinearParams, x: jax.Array, *, training: bool = False,
          compute_dtype=jnp.bfloat16, matmul_impl: str = "auto",
          dense_weight: Optional[jax.Array] = None) -> jax.Array:
    """Forward pass. x: (..., in_features) -> (..., out_features).

    ``dense_weight`` lets callers pass a cached calc_weight() result during
    block-wise finetune (the reference's self.W cache, quantizer.py:505-507).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, x.shape[-1])
    x_dtype = x.dtype
    if p.SU is not None:
        x = x * p.SU.astype(x_dtype)

    if training or dense_weight is not None:
        if dense_weight is None:
            dense_weight = p.W_cache
        W = dense_weight if dense_weight is not None else calc_weight(
            p, dtype=x_dtype)
        if x.shape[-1] != p.q_in:
            x = jnp.pad(x, [(0, 0), (0, p.q_in - x.shape[-1])])
        out = (x @ W.astype(x_dtype))[:, : p.out_features]
    else:
        sv = p.Wscale if p.per_channel else None
        res = (_grouped_prologue_matmul(x, p.left_spec, p.qweight,
                                        p.wscale_float, compute_dtype,
                                        scale_vec=sv,
                                        right_spec=p.right_spec)
               if matmul_impl in ("auto", "pallas") else None)
        pc_fused = right_done = False
        out = None
        if res is not None:
            out, right_done = res
            pc_fused = sv is not None
        if out is None:
            x = matmul_hadUt(x, p.left_spec, scale=p.wscale_float)
            x = x.astype(compute_dtype)
            out = quant_matmul(x, p.qweight, impl=matmul_impl)
        out = out.astype(x_dtype)
        if p.per_channel and not pc_fused:
            out = out * p.Wscale.astype(x_dtype)
        if right_done:
            out = finish_right(out, p.right_spec)[:, : p.out_features]
        else:
            out = matmul_hadU(out, p.right_spec)[:, : p.out_features]

    if p.SV is not None:
        out = out * p.SV.astype(out.dtype)
    out = out.reshape(*batch_shape, p.out_features)
    if p.bias is not None:
        out = out + p.bias.astype(out.dtype)
    return out
