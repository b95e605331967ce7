"""Stacked-expert MoE layers: top-K sparse decode over lattice-coded
experts, TPU-native.

Parity target: the reference quantizes Mixtral per-expert
(``/root/reference/constants.py:60-94``, ``utils.py:176-185``) and relies
on torch host control flow to run each expert on its routed tokens. Under
jit that branching is impossible, and the round-1 dense formulation
(every expert on every token, masked) pays E/K× the HBM bandwidth of
ideal top-K routing. Here every expert weight array is STACKED along a
leading E axis, which enables, in order of preference:

  1. sparse decode (``moe_sparse_apply``): (token, slot) pairs become
     R = m*K rows, each carrying its expert id; per-row incoherence
     transforms are batched gathers + einsums over the stacked SU/hadK,
     and the core matmul is the scalar-prefetch Pallas kernel
     (ops/moe_pallas.py) that only DMAs the selected experts' planes;
  2. a dense all-experts formulation over the stacked arrays
     (``moe_dense_stacked_apply``) whose E axis shards over an "ep" mesh
     axis (expert parallelism — SURVEY.md §2.4, BASELINE north-star #4);
  3. per-expert unstacked views (``unstack_qlinear``) so the prefill
     loop keeps the round-1 memory profile on a single replica.

The stacked container is runtime-only: checkpoints keep the reference's
per-expert schema, and ``models.llama.fuse_for_inference`` builds the
stack at load time (like qkv/gateup fusion).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import QuantizedTensor, decode_affine
from ..transforms.incoherence import hadamard_transform
from .qlinear import QuantLinearParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedQuantLinear:
    """E experts' worth of one linear (or a fused segment group like
    w1+w3) with identical geometry, stacked on a leading expert axis.

    Segments within an expert share that expert's left transform (the
    quantizer's share_group_transforms guarantee); the per-expert wscale
    and per-channel Wscale fold into ``pre_vec`` applied on the output
    side (same move as FusedQuantLinear's uniform epilogue).
    """
    planes: Dict[str, jax.Array]            # (E, nseg*seg_out, Gp) int32
    SU: Optional[jax.Array]                 # (E, q_in) or None
    had_left: Optional[jax.Array]           # (E, K_l, K_l) or None
    pre_vec: jax.Array                      # (E, nseg*seg_out) f32
    had_right: Optional[jax.Array]          # (E, nseg, K_r, K_r) or None
    SV_all: Optional[jax.Array]             # (E, nseg*seg_out) or None
    bias_all: Optional[jax.Array]           # (E, nseg*out_f) or None
    E: int = dataclasses.field(metadata=dict(static=True))
    nseg: int = dataclasses.field(metadata=dict(static=True))
    in_features: int = dataclasses.field(metadata=dict(static=True))
    q_in: int = dataclasses.field(metadata=dict(static=True))
    seg_out: int = dataclasses.field(metadata=dict(static=True))
    K_left: int = dataclasses.field(metadata=dict(static=True))
    K_right: int = dataclasses.field(metadata=dict(static=True))
    codebook_id: str = dataclasses.field(metadata=dict(static=True))
    opt_resid_scale: float = dataclasses.field(metadata=dict(static=True))

    @property
    def q_out_total(self) -> int:
        return self.nseg * self.seg_out


def _stackable(groups: List[List[QuantLinearParams]]) -> bool:
    """All experts' segment groups uniform + per-group shared left side."""
    try:
        g0 = groups[0]
    except (KeyError, IndexError):
        return False
    p00 = g0[0]
    nseg = len(g0)
    for g in groups:
        if len(g) != nseg:
            return False
        for p in g:
            if not isinstance(p, QuantLinearParams):
                return False
            if (p.q_in != p00.q_in or p.q_out != p00.q_out
                    or p.out_features != p.q_out
                    or p.in_features != p00.in_features
                    or p.K_left != p00.K_left or p.K_right != p00.K_right
                    or p.shards_left != 1 or p.shards_right != 1
                    or p.qweight.codebook_id != p00.qweight.codebook_id
                    or (p.SU is None) != (p00.SU is None)
                    or (p.SV is None) != (p00.SV is None)
                    or (p.bias is None) != (p00.bias is None)
                    or (p.had_left is None) != (p00.had_left is None)
                    or (p.had_right is None) != (p00.had_right is None)):
                return False
        # segments of one expert must share the expert's left transform
        for p in g[1:]:
            for a, b in ((p.SU, g[0].SU), (p.had_left, g[0].had_left)):
                if a is not None and not np.array_equal(np.asarray(a),
                                                        np.asarray(b)):
                    return False
    return True


def stack_qlinears(groups: List[List[QuantLinearParams]]
                   ) -> Optional[StackedQuantLinear]:
    """[[seg0, seg1, ...] per expert] -> StackedQuantLinear, or None when
    the geometry is not uniform (caller keeps the per-expert list)."""
    if not _stackable(groups):
        return None
    g0 = groups[0]
    p0 = g0[0]
    nseg, E = len(g0), len(groups)
    if p0.qweight.layout != "nibble":
        # the sparse scalar-prefetch MoE kernel decodes nibble planes;
        # experts loaded in the paired RVQ4B layout re-encode here (one
        # host roundtrip at fuse time, exact by construction) and the
        # sw subword layouts bitcast back on device
        from ..ops.qtensor import from_bfp, from_subword, paired_to_nibble
        import dataclasses as _dc
        back = {"paired": paired_to_nibble,
                "bfp": from_bfp}.get(p0.qweight.layout, from_subword)
        groups = [
            [_dc.replace(p, qweight=back(p.qweight)) for p in g]
            for g in groups
        ]
        g0 = groups[0]
        p0 = g0[0]
    plane_keys = sorted(p0.qweight.planes)
    planes = {
        k: jnp.stack([
            jnp.concatenate([p.qweight.planes[k] for p in g], axis=0)
            for g in groups])
        for k in plane_keys
    }
    SU = (jnp.stack([g[0].SU for g in groups])
          if p0.SU is not None else None)
    had_left = (jnp.stack([jnp.asarray(g[0].had_left) for g in groups])
                if p0.had_left is not None else None)

    def expert_pre(g):
        parts = []
        for p in g:
            v = jnp.full((p.q_out,), p.wscale_float, jnp.float32)
            if p.per_channel:
                v = v * p.Wscale.astype(jnp.float32)
            parts.append(v)
        return jnp.concatenate(parts)

    pre_vec = jnp.stack([expert_pre(g) for g in groups])
    had_right = None
    if p0.had_right is not None:
        had_right = jnp.stack([
            jnp.stack([jnp.asarray(p.had_right) for p in g])
            for g in groups])
    SV_all = None
    if p0.SV is not None:
        SV_all = jnp.stack([
            jnp.concatenate([p.SV.astype(jnp.float32) for p in g])
            for g in groups])
    bias_all = None
    if p0.bias is not None:
        bias_all = jnp.stack([
            jnp.concatenate([p.bias.astype(jnp.float32) for p in g])
            for g in groups])
    return StackedQuantLinear(
        planes=planes, SU=SU, had_left=had_left, pre_vec=pre_vec,
        had_right=had_right, SV_all=SV_all, bias_all=bias_all,
        E=E, nseg=nseg, in_features=p0.in_features, q_in=p0.q_in,
        seg_out=p0.q_out, K_left=p0.K_left, K_right=p0.K_right,
        codebook_id=p0.qweight.codebook_id,
        opt_resid_scale=p0.qweight.opt_resid_scale)


def unstack_qlinear(sq: StackedQuantLinear, e: int
                    ) -> List[QuantLinearParams]:
    """Per-expert segment views (static slicing) — used by the dense
    prefill loop so stacked params keep the round-1 memory profile."""
    outs = []
    for s in range(sq.nseg):
        lo = s * sq.seg_out
        planes = {k: v[e, lo:lo + sq.seg_out] for k, v in sq.planes.items()}
        qt = QuantizedTensor(planes, sq.codebook_id, sq.seg_out, sq.q_in,
                             sq.opt_resid_scale)
        outs.append(QuantLinearParams(
            qweight=qt,
            Wscale=sq.pre_vec[e, lo:lo + sq.seg_out],
            SU=None if sq.SU is None else sq.SU[e],
            SV=None if sq.SV_all is None else sq.SV_all[e,
                                                        lo:lo + sq.seg_out],
            bias=None if sq.bias_all is None else
            sq.bias_all[e, lo:lo + sq.seg_out],
            had_left=None if sq.had_left is None else sq.had_left[e],
            had_right=None if sq.had_right is None else sq.had_right[e, s],
            in_features=sq.in_features, out_features=sq.seg_out,
            K_left=sq.K_left, K_right=sq.K_right,
            q_in=sq.q_in, q_out=sq.seg_out,
            per_channel=True, wscale_float=1.0))
    return outs


# ----------------------------------------------------------- row transforms

def _left_transform_rows(sq: StackedQuantLinear, x: jax.Array,
                         eids: jax.Array) -> jax.Array:
    """x (R, in_features) -> (R, q_in) in each row's expert basis (U^T x,
    unscaled: the wscale lives in pre_vec on the output side)."""
    R, n = x.shape
    if n != sq.q_in:
        x = jnp.pad(x, ((0, 0), (0, sq.q_in - n)))
    K, M = sq.K_left, sq.q_in // sq.K_left
    Y = x.reshape(R, K, M)
    Y = hadamard_transform(Y, 1.0 / math.sqrt(M))
    if K > 1:
        hadK = jnp.take(sq.had_left, eids, axis=0).astype(Y.dtype)
        # hadUt: out_j = sum_k Y_k hadK[k, j]
        Y = jnp.einsum("rkm,rkj->rjm", Y, hadK)
    return Y.reshape(R, sq.q_in)


def _right_transform_rows(sq: StackedQuantLinear, y: jax.Array,
                          eids: jax.Array) -> jax.Array:
    """y (R, nseg*seg_out) pre-transformed -> output basis per row."""
    R = y.shape[0]
    K, M = sq.K_right, sq.seg_out // sq.K_right
    Y = y.reshape(R, sq.nseg, K, M)
    Y = hadamard_transform(Y, 1.0 / math.sqrt(M))
    if K > 1:
        hadK = jnp.take(sq.had_right, eids, axis=0).astype(Y.dtype)
        # hadU: out_j = sum_k hadK[j, k] Y_k
        Y = jnp.einsum("rskm,rsjk->rsjm", Y, hadK)
    return Y.reshape(R, sq.nseg * sq.seg_out)


def _decode_rows_matmul(sq: StackedQuantLinear, x_perm: jax.Array,
                        eids: jax.Array) -> jax.Array:
    """XLA fallback for the sparse core: gather the selected experts'
    planes, decode densely, one batched matmul. Memory ∝ R·q_out·q_in —
    fine for tests/small models; the Pallas path covers scale."""
    affine = decode_affine(sq.codebook_id, sq.opt_resid_scale)
    keys = sorted(sq.planes)
    beta = sum(b for _, b in affine)
    R = x_perm.shape[0]
    Gp = sq.planes[keys[0]].shape[-1]
    acc = None
    for key, (alpha, _) in zip(keys, affine):
        w = jax.lax.bitcast_convert_type(
            jnp.take(sq.planes[key], eids, axis=0), jnp.uint32)
        planes_i = []
        for i in range(8):
            nib = w >> (4 * i) if i == 7 else (w >> (4 * i)) & 0xF
            planes_i.append(nib.astype(jnp.float32))
        wf = jnp.stack(planes_i, axis=-2) * alpha   # (R, q_out, 8, Gp)
        acc = wf if acc is None else acc + wf
    # x_perm rows are (8, Gp) flattened; contract both axes
    Xg = x_perm.reshape(R, 8, Gp)
    out = jnp.einsum("rig,rqig->rq", Xg.astype(jnp.float32), acc)
    # beta correction: beta_total * rowsum(x)
    out = out + beta * jnp.sum(Xg.astype(jnp.float32), axis=(1, 2),
                               keepdims=False)[:, None]
    return out.astype(x_perm.dtype)


def stacked_rows_apply(sq: StackedQuantLinear, x: jax.Array,
                       eids: jax.Array, *,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """x: (R, in_features) rows, eids: (R,) expert per row ->
    (R, nseg*seg_out). The full QuantLinear pipeline with every per-expert
    table resolved by batched gathers."""
    R = x.shape[0]
    dt = x.dtype
    if sq.SU is not None:
        x = x * jnp.take(sq.SU, eids, axis=0).astype(dt)
    xt = _left_transform_rows(sq, x, eids)
    # grouped permutation for the plane-contiguous kernel layout
    G = sq.q_in // 8
    Gp = sq.planes[sorted(sq.planes)[0]].shape[-1]
    x_perm = xt.reshape(R, G, 8).transpose(0, 2, 1)
    if Gp != G:
        x_perm = jnp.pad(x_perm, ((0, 0), (0, 0), (0, Gp - G)))
    x_perm = x_perm.reshape(R, 8 * Gp).astype(compute_dtype)
    from ..ops.moe_pallas import moe_fused_matmul, supports_moe
    if supports_moe(sq.planes, sq.q_out_total):
        # sort rows by expert id: the kernel iterates rows innermost, so
        # consecutive same-expert rows reuse the resident plane block —
        # per weight tile the planes stream once per DISTINCT expert
        # (matters for batched decode; R is tiny so the sort is free)
        order = jnp.argsort(eids)
        out_sorted = moe_fused_matmul(
            jnp.take(x_perm, order, axis=0), jnp.take(eids, order),
            sq.planes, sq.codebook_id, sq.opt_resid_scale, sq.q_out_total)
        inv = jnp.argsort(order)
        out = jnp.take(out_sorted, inv, axis=0)
    else:
        out = _decode_rows_matmul(sq, x_perm, eids)
    out = out.astype(dt) * jnp.take(sq.pre_vec, eids, axis=0).astype(dt)
    out = _right_transform_rows(sq, out, eids)
    if sq.SV_all is not None:
        out = out * jnp.take(sq.SV_all, eids, axis=0).astype(dt)
    if sq.bias_all is not None:
        out = out + jnp.take(sq.bias_all, eids, axis=0).astype(dt)
    return out


# ----------------------------------------------------------- MoE layers

def moe_sparse_apply(cfg, moe_p: dict, x: jax.Array,
                     router_logits: jax.Array, *,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """Top-K routed MoE over stacked experts. x: (B, S, D)."""
    st = moe_p["experts_stacked"]
    B, S, D = x.shape
    m = B * S
    Kt = cfg.num_experts_per_tok
    xt = x.reshape(m, D)
    topv, topi = jax.lax.top_k(
        router_logits.reshape(m, -1).astype(jnp.float32), Kt)
    topw = jax.nn.softmax(topv, axis=-1)                  # (m, K)
    x_rows = jnp.repeat(xt, Kt, axis=0)                   # (m*K, D)
    eids = topi.reshape(-1).astype(jnp.int32)
    h = stacked_rows_apply(st["w13"], x_rows, eids,
                           compute_dtype=compute_dtype)
    g, u = jnp.split(h, 2, axis=-1)
    act = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u
    y = stacked_rows_apply(st["w2"], act, eids,
                           compute_dtype=compute_dtype)   # (m*K, D')
    y = y.reshape(m, Kt, -1) * topw[..., None].astype(y.dtype)
    return jnp.sum(y, axis=1).reshape(B, S, -1).astype(x.dtype)


def moe_dense_stacked_apply(cfg, moe_p: dict, x: jax.Array,
                            router_logits: jax.Array, *,
                            compute_dtype=jnp.bfloat16) -> jax.Array:
    """Dense all-experts formulation over the stacked arrays: the E axis
    is a plain array axis, so sharding it with PartitionSpec("ep", ...)
    distributes expert compute across the mesh (expert parallelism); the
    final routing contraction over E becomes an XLA psum over "ep".

    Memory ∝ E · tokens — intended for EP-sharded prefill and mesh tests;
    single-replica prefill uses the per-expert unstacked loop instead.
    """
    st = moe_p["experts_stacked"]
    w13, w2 = st["w13"], st["w2"]
    B, S, D = x.shape
    m = B * S
    E, Kt = cfg.num_local_experts, cfg.num_experts_per_tok
    xt = x.reshape(m, D)
    topv, topi = jax.lax.top_k(
        router_logits.reshape(m, E).astype(jnp.float32), Kt)
    topw = jax.nn.softmax(topv, axis=-1)
    routing = jnp.sum(
        jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None],
        axis=1)                                           # (m, E)

    all_eids = jnp.arange(E, dtype=jnp.int32)

    def per_expert(sq: StackedQuantLinear, rows: jax.Array) -> jax.Array:
        # rows: (E, m, in) in each expert's slot -> (E, m, out)
        def one(e, r):
            return stacked_rows_apply(
                sq, r, jnp.full((r.shape[0],), e, jnp.int32),
                compute_dtype=compute_dtype)
        return jax.vmap(one)(all_eids, rows)

    xs = jnp.broadcast_to(xt[None], (E, m, D))
    h = per_expert(w13, xs)                               # (E, m, 2I)
    g, u = jnp.split(h, 2, axis=-1)
    act = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype) * u
    y = per_expert(w2, act)                               # (E, m, D)
    out = jnp.einsum("me,emd->md", routing.astype(jnp.float32),
                     y.astype(jnp.float32))
    return out.reshape(B, S, -1).astype(x.dtype)


def stack_experts(moe_p: dict) -> Optional[dict]:
    """Per-expert {w1, w3, w2} list -> {"w13": ..., "w2": ...} stacked
    containers, or None if any expert is not uniformly quantized."""
    experts = moe_p.get("experts")
    if not experts:
        return None
    try:
        w13 = stack_qlinears([[e["w1"], e["w3"]] for e in experts])
        w2 = stack_qlinears([[e["w2"]] for e in experts])
    except (KeyError, TypeError):
        return None
    if w13 is None or w2 is None:
        return None
    return {"w13": w13, "w2": w2}
