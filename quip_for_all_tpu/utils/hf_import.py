"""Import stock HuggingFace fp16/bf16 checkpoints (llama family, Mixtral)
into our native params pytree.

The reference operates directly on HF torch modules (``quantizer.py:163``);
here we read the safetensors files (single or index-sharded) without torch
and map HF state-dict names onto the functional pytree of models/llama.py.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from ..models.config import ModelConfig


def _open_all_tensors(path: str) -> Dict[str, np.ndarray]:
    index = os.path.join(path, "model.safetensors.index.json")
    tensors: Dict[str, np.ndarray] = {}
    if os.path.isfile(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        by_file: Dict[str, list] = {}
        for name, fn in weight_map.items():
            by_file.setdefault(fn, []).append(name)
        for fn, names in by_file.items():
            with safe_open(os.path.join(path, fn), framework="numpy") as f:
                for n in names:
                    tensors[n] = f.get_tensor(n)
        return tensors
    single = os.path.join(path, "model.safetensors")
    with safe_open(single, framework="numpy") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return tensors


def load_hf_model(path: str, dtype=jnp.float32
                  ) -> Tuple[ModelConfig, Dict[str, Any]]:
    cfg = ModelConfig.from_pretrained_dir(path)
    t = _open_all_tensors(path)

    def lin(name):
        d = {"weight": jnp.asarray(np.asarray(t[name + ".weight"],
                                              dtype=np.float32),
                                   dtype=dtype)}
        d["bias"] = (jnp.asarray(np.asarray(t[name + ".bias"],
                                            dtype=np.float32), dtype=dtype)
                     if name + ".bias" in t else None)
        return d

    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jnp.asarray(
            np.asarray(t["model.embed_tokens.weight"], dtype=np.float32),
            dtype=dtype)},
        "norm": {"weight": jnp.asarray(
            np.asarray(t["model.norm.weight"], dtype=np.float32),
            dtype=dtype)},
        "layers": [],
    }
    if "lm_head.weight" in t:
        params["lm_head"] = lin("lm_head")

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        blk: Dict[str, Any] = {
            "input_layernorm": {"weight": jnp.asarray(
                np.asarray(t[f"{p}.input_layernorm.weight"],
                           dtype=np.float32), dtype=dtype)},
            "post_attention_layernorm": {"weight": jnp.asarray(
                np.asarray(t[f"{p}.post_attention_layernorm.weight"],
                           dtype=np.float32), dtype=dtype)},
            "self_attn": {x: lin(f"{p}.self_attn.{x}")
                          for x in ("q_proj", "k_proj", "v_proj",
                                    "o_proj")},
        }
        if cfg.arch == "mixtral":
            blk["block_sparse_moe"] = {
                "gate": lin(f"{p}.block_sparse_moe.gate"),
                "experts": [
                    {w: lin(f"{p}.block_sparse_moe.experts.{e}.{w}")
                     for w in ("w1", "w2", "w3")}
                    for e in range(cfg.num_local_experts)
                ],
            }
        else:
            blk["mlp"] = {x: lin(f"{p}.mlp.{x}")
                          for x in ("gate_proj", "up_proj", "down_proj")}
        params["layers"].append(blk)
    return cfg, params
