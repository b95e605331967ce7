"""LoRA adapters over quantized (or dense) linears.

Parity target: ``/root/reference/example_finetune.py`` (PEFT LoRA on a
frozen QuipQuantizer model, monkey-patching LoraModel to wrap QuantLinear).
Here adapters are first-class pytree entries: a wrapped linear is the dict

    {"lora_base": <QuantLinearParams | dense dict>,
     "lora_A": (r, in), "lora_B": (out, r), "lora_scale": alpha/r}

dispatched by models.llama.linear_apply; gradients flow through A/B only
(the base stays frozen, its training path never engages).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .qlinear import QuantLinearParams

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                   "gate_proj", "up_proj", "down_proj")


def is_lora(node) -> bool:
    return isinstance(node, dict) and "lora_base" in node


def _dims(lin) -> tuple:
    if isinstance(lin, QuantLinearParams):
        return lin.in_features, lin.out_features
    w = lin["weight"]
    return w.shape[1], w.shape[0]


def add_lora(params: Dict[str, Any], rank: int = 8, alpha: float = 16.0,
             targets: Sequence[str] = DEFAULT_TARGETS,
             seed: int = 0, dtype=jnp.float32) -> Dict[str, Any]:
    """Wrap matching linears in the block tree with LoRA adapters
    (A ~ N(0, 1/r) like PEFT's kaiming-ish init, B = 0)."""
    rng = np.random.default_rng(seed)

    def wrap(node, name):
        if isinstance(node, QuantLinearParams) or (
                isinstance(node, dict) and "weight" in node):
            if not any(name.endswith(t) for t in targets):
                return node
            in_f, out_f = _dims(node)
            A = (rng.standard_normal((rank, in_f)) / np.sqrt(rank)
                 ).astype(np.float32)
            return {"lora_base": node,
                    "lora_A": jnp.asarray(A, dtype=dtype),
                    "lora_B": jnp.zeros((out_f, rank), dtype),
                    "lora_scale": jnp.asarray(alpha / rank, dtype)}
        if is_lora(node):
            return node
        if isinstance(node, dict):
            return {k: wrap(v, f"{name}.{k}" if name else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [wrap(v, f"{name}.{i}") for i, v in enumerate(node)]
        return node

    out = dict(params)
    out["layers"] = wrap(params["layers"], "layers")
    return out


def lora_apply(d: Dict[str, Any], x: jax.Array, **kw) -> jax.Array:
    from ..models.llama import linear_apply
    base = linear_apply(d["lora_base"], x, **{
        k: v for k, v in kw.items() if k != "training"})
    h = jax.lax.dot_general(x, d["lora_A"].astype(x.dtype),
                            (((x.ndim - 1,), (1,)), ((), ())))
    delta = jax.lax.dot_general(h, d["lora_B"].astype(x.dtype),
                                (((h.ndim - 1,), (1,)), ((), ())))
    return base + d["lora_scale"].astype(x.dtype) * delta


def collect_lora_trainable(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}

    def walk(node, name):
        if is_lora(node):
            out[f"{name}.lora_A"] = node["lora_A"]
            out[f"{name}.lora_B"] = node["lora_B"]
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{name}.{k}" if name else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{name}.{i}")

    walk(tree, prefix)
    return out


def apply_lora_trainable(tree: Any, flat: Dict[str, Any],
                         prefix: str = "") -> Any:
    def walk(node, name):
        if is_lora(node):
            new = dict(node)
            if f"{name}.lora_A" in flat:
                new["lora_A"] = flat[f"{name}.lora_A"]
                new["lora_B"] = flat[f"{name}.lora_B"]
            return new
        if isinstance(node, dict):
            return {k: walk(v, f"{name}.{k}" if name else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, f"{name}.{i}")
                              for i, v in enumerate(node))
        return node

    return walk(tree, prefix)
