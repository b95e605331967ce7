"""GSPMD sharding layer: device mesh + PartitionSpecs for model pytrees.

The reference has no distributed backend at all (SURVEY.md §2.4): its only
multi-device mode is accelerate's sequential layer placement, and it
documents tensor parallelism as impossible ("Hadamard transform cannot be
done for sharded input", reference README.md:84). Here parallelism is a
first-class layer: a ("dp", "tp") mesh, megatron-style column/row-parallel
PartitionSpecs over both dense and lattice-coded (QuantizedTensor) weights,
and XLA-inserted collectives. The Hadamard conflict is solved two ways:
  1. GSPMD correctness for any checkpoint (XLA gathers where it must);
  2. quantization-time block-diagonal transforms (tp_shards > 1) that make
     each shard's incoherence factor local, so no gather is needed —
     see quantize/quantizer.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..nn.qlinear import QuantLinearParams

# layer-role tables (the reference's constants.py pattern DB, reduced to our
# native model families)
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                 "w1", "w3", "w13", "lm_head",
                 "query_key_value", "dense_h_to_4h",       # gpt_neox
                 "fc1",                                    # opt
                 "W_pack",                                 # baichuan
                 "fc_in",                                  # gptj
                 "c_attn", "mlp.w2",  # qwen/gpt2 fused qkv; qwen up-proj
                 "c_fc")                                   # gpt2
# NOTE: qwen's "mlp.w2" is an UP projection (column-parallel) while
# mixtral's "experts.{e}.w2" is the down projection (row-parallel) — the
# longer suffix above wins because _COL_PARALLEL is checked first.
_ROW_PARALLEL = ("o_proj", "down_proj", "w2",
                 "dense", "dense_4h_to_h",                 # gpt_neox
                 "out_proj", "fc2",                        # opt
                 "fc_out",                                 # gptj
                 "c_proj")                                 # qwen/gpt2


def role_of(name: str) -> str:
    """Megatron role of a linear layer by name: "col" (output-sharded),
    "row" (input-sharded), or "rep" (replicated)."""
    if any(name.endswith(s) for s in _COL_PARALLEL):
        return "col"
    if any(name.endswith(s) for s in _ROW_PARALLEL):
        return "row"
    return "rep"


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, ep: int = 1) -> Mesh:
    """("dp", "tp") mesh, or ("dp", "ep", "tp") when ep > 1 — the "ep"
    axis shards the stacked expert dimension of MoE layers (SURVEY §2.4
    expert parallelism; the reference has no distributed backend)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if tp is None:
        tp = (n // ep) if dp is None else n // (dp * ep)
    if dp is None:
        dp = n // (tp * ep)
    assert dp * tp * ep == n, (dp, ep, tp, n)
    if ep > 1:
        arr = np.array(devs[:n]).reshape(dp, ep, tp)
        return Mesh(arr, ("dp", "ep", "tp"))
    arr = np.array(devs[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _divides(n: int, k: int) -> bool:
    return k > 0 and n % k == 0


def qlinear_spec(p: QuantLinearParams, role: str, tp: int
                 ) -> QuantLinearParams:
    """PartitionSpec pytree matching a QuantLinearParams instance."""
    import dataclasses as dc

    col = role == "col"
    bfp = p.qweight.layout == "bfp"
    shard_out = col and _divides(p.q_out // 2 if bfp else p.q_out, tp)
    # the paired RVQ4B layout's half/parity planes are not column-local
    # (a plane column covers groups in two disjoint ranges), so row-
    # parallel paired layers replicate their planes instead of sharding
    # the q_in axis
    shard_in = (not col) and _divides(p.q_in, tp) \
        and p.qweight.layout != "paired"

    def plane_spec(arr):
        # runtime planes are (q_out, cols(q_in)); bfp planes are
        # (2, q_out/2, cols) — sharding row PAIRS keeps pairs whole, so
        # each shard decodes the same contiguous q_out rows as nibble
        if bfp:
            return (P(None, "tp", None) if shard_out
                    else P(None, None, "tp") if shard_in
                    else P(None, None, None))
        if shard_out:
            return P("tp", None)
        if shard_in:
            return P(None, "tp")
        return P(None, None)

    planes = {k: plane_spec(v) for k, v in p.qweight.planes.items()}
    qt_spec = type(p.qweight)(planes, p.qweight.codebook_id,
                              p.qweight.q_out, p.qweight.q_in,
                              p.qweight.opt_resid_scale,
                              layout=p.qweight.layout)
    return dc.replace(
        p,
        qweight=qt_spec,
        Wscale=None if p.Wscale is None else (P("tp") if shard_out else P()),
        SU=None if p.SU is None else (P("tp") if shard_in else P()),
        SV=None if p.SV is None else (P("tp") if shard_out else P()),
        bias=None if p.bias is None else (P("tp") if shard_out else P()),
        had_left=None if p.had_left is None else P(None, None),
        had_right=None if p.had_right is None else P(None, None),
        wscale_float=P(),    # dynamic scalar leaf, replicated
        W_cache=None if p.W_cache is None else P(None, None))


def stacked_spec(sq, role: str, tp: int, ep_name: Optional[str], ep: int):
    """PartitionSpec pytree for a StackedQuantLinear (nn/qmoe.py): the
    leading E axis shards over "ep"; within an expert, col-parallel stacks
    shard q_out over "tp" and row-parallel ones shard the plane columns
    (megatron roles, same rules as qlinear_spec)."""
    import dataclasses as dc

    e_ax = ep_name if (ep_name is not None and _divides(sq.E, ep)) else None
    col = role == "col"
    shard_out = col and _divides(sq.q_out_total, tp)
    shard_in = (not col) and _divides(sq.q_in, tp)
    planes = {
        k: (P(e_ax, "tp", None) if shard_out
            else P(e_ax, None, "tp") if shard_in
            else P(e_ax, None, None))
        for k in sq.planes
    }
    out_vec = P(e_ax, "tp") if shard_out else P(e_ax, None)
    in_vec = P(e_ax, "tp") if shard_in else P(e_ax, None)
    return dc.replace(
        sq,
        planes=planes,
        SU=None if sq.SU is None else in_vec,
        had_left=None if sq.had_left is None else P(e_ax, None, None),
        pre_vec=out_vec,
        had_right=None if sq.had_right is None else P(e_ax, None, None,
                                                      None),
        SV_all=None if sq.SV_all is None else out_vec,
        bias_all=None if sq.bias_all is None else out_vec)


def dense_spec(lin: Dict[str, Any], role: str, tp: int,
               out_f: int, in_f: int) -> Dict[str, Any]:
    if role == "col" and _divides(out_f, tp):
        w = P("tp", None)
        b = P("tp")
    elif role == "row" and _divides(in_f, tp):
        w = P(None, "tp")
        b = P()
    else:
        w, b = P(None, None), P()
    out = {k: None for k in lin}
    out["weight"] = w
    if lin.get("bias") is not None:
        out["bias"] = b
    return out


def param_specs(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh
                ) -> Dict[str, Any]:
    """PartitionSpec pytree mirroring the params pytree."""
    tp = mesh.shape["tp"]
    ep_name = "ep" if "ep" in mesh.axis_names else None
    ep = mesh.shape["ep"] if ep_name else 1

    def role_of(name: str) -> str:
        if any(name.endswith(s) for s in _COL_PARALLEL):
            return "col"
        if any(name.endswith(s) for s in _ROW_PARALLEL):
            return "row"
        return "rep"

    def walk(node, name):
        from ..nn.qmoe import StackedQuantLinear
        if isinstance(node, StackedQuantLinear):
            return stacked_spec(node, role_of(name), tp, ep_name, ep)
        if isinstance(node, QuantLinearParams):
            return qlinear_spec(node, role_of(name), tp)
        if isinstance(node, dict):
            if "weight" in node and not isinstance(node["weight"], dict):
                w = node["weight"]
                if w.ndim == 2:
                    return dense_spec(node, role_of(name), tp,
                                      w.shape[0], w.shape[1])
                return {k: (P() if v is not None else None)
                        for k, v in node.items()}
            return {k: walk(v, f"{name}.{k}" if name else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, f"{name}.{i}")
                              for i, v in enumerate(node))
        if node is None:
            return None
        return P()

    return walk(params, "")


def shard_params(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh
                 ) -> Dict[str, Any]:
    """Device-put params with their computed shardings."""
    specs = param_specs(cfg, params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None else jax.device_put(
            x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: x is None)


def kv_cache_specs(mesh: Mesh, n_kv_heads: int):
    tp = mesh.shape["tp"]
    kv = P("dp", None, "tp", None) if _divides(n_kv_heads, tp) else \
        P("dp", None, None, None)
    return kv


def batch_spec() -> P:
    return P("dp", None)
