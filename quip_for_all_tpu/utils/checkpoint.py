"""Quantized checkpoint save/load, reference-compatible schema.

Parity target: the reference's checkpoint layout (SURVEY.md §5):
safetensors with HF state-dict names; QuantLinear buffers Qidxs (packed,
codebook idx_dtype), SU, SV, Wscale (unnormalized), bias, had_left/had_right
(persisted only for use_rand), and the fake scalar ``weight`` HF uses for
device mapping; plus config.json with an embedded quantization_config and a
standalone quantization_config.json (``quantizer.py:718-756``).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import save_file

from ..codebooks import get_codebook
from ..models.config import ModelConfig
from ..nn.qlinear import QuantLinearParams
from ..ops.qtensor import from_checkpoint_idxs, to_checkpoint_idxs
from ..transforms.incoherence import get_hadK

QUIP_CONFIG = "quantization_config.json"


def _flatten(params: Dict[str, Any], qcfg: dict, prefix: str = "model."
             ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def emit_linear(name: str, lin):
        if isinstance(lin, QuantLinearParams):
            out[name + ".Qidxs"] = to_checkpoint_idxs(lin.qweight)
            su = (np.asarray(lin.SU, dtype=np.float32) if lin.SU is not None
                  else np.ones((lin.in_features,), np.float32))
            sv = (np.asarray(lin.SV, dtype=np.float32) if lin.SV is not None
                  else np.ones((lin.out_features,), np.float32))
            out[name + ".SU"] = su
            out[name + ".SV"] = sv
            if lin.per_channel:
                out[name + ".Wscale"] = (
                    np.asarray(lin.Wscale, np.float32) * lin.wscale_float)
            else:
                out[name + ".Wscale"] = np.asarray(lin.wscale_float,
                                                   np.float32)
            out[name + ".weight"] = np.zeros((), np.float32)  # HF shim
            if lin.bias is not None:
                out[name + ".bias"] = np.asarray(lin.bias, np.float32)
            if qcfg.get("use_rand", True):
                if lin.had_left is not None:
                    out[name + ".had_left"] = np.asarray(lin.had_left,
                                                         np.float32)
                if lin.had_right is not None:
                    out[name + ".had_right"] = np.asarray(lin.had_right,
                                                          np.float32)
        else:
            out[name + ".weight"] = np.asarray(lin["weight"], np.float32)
            if lin.get("bias") is not None:
                out[name + ".bias"] = np.asarray(lin["bias"], np.float32)

    def walk(node, name):
        if isinstance(node, QuantLinearParams) or (
                isinstance(node, dict) and "weight" in node):
            emit_linear(name, node)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{name}.{k}" if name else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{name}.{i}")
        elif node is None:
            return
        else:
            out[name] = np.asarray(node, np.float32)

    for key, node in params.items():
        name = ("" if key == "lm_head" else prefix) + key
        walk(node, name)
    return out


# Table-driven HF config.json emitter: hf_key -> ModelConfig attribute name
# (string) or callable(cfg). model_type resolves via _model_type.
_LLAMA_KEYS = {
    "vocab_size": "vocab_size",
    "hidden_size": "hidden_size",
    "intermediate_size": "intermediate_size",
    "num_hidden_layers": "num_hidden_layers",
    "num_attention_heads": "num_attention_heads",
    "num_key_value_heads": "num_key_value_heads",
    "head_dim": "head_dim",
    "max_position_embeddings": "max_position_embeddings",
    "rms_norm_eps": "rms_norm_eps",
    "rope_theta": "rope_theta",
    "attention_bias": "attention_bias",
    "tie_word_embeddings": "tie_word_embeddings",
    "num_local_experts": "num_local_experts",
    "num_experts_per_tok": "num_experts_per_tok",
}
_HF_CONFIG_KEYS = {
    "gpt2": {
        "vocab_size": "vocab_size", "n_embd": "hidden_size",
        "n_inner": "intermediate_size", "n_layer": "num_hidden_layers",
        "n_head": "num_attention_heads",
        "n_positions": "max_position_embeddings",
        "layer_norm_epsilon": "rms_norm_eps",
    },
    "gpt_neox": {
        "vocab_size": "vocab_size", "hidden_size": "hidden_size",
        "intermediate_size": "intermediate_size",
        "num_hidden_layers": "num_hidden_layers",
        "num_attention_heads": "num_attention_heads",
        "max_position_embeddings": "max_position_embeddings",
        "layer_norm_eps": "rms_norm_eps", "rotary_emb_base": "rope_theta",
        "rotary_pct": "rotary_pct",
        "use_parallel_residual": "use_parallel_residual",
    },
    "gptj": {
        "vocab_size": "vocab_size", "n_embd": "hidden_size",
        "n_inner": "intermediate_size", "n_layer": "num_hidden_layers",
        "n_head": "num_attention_heads",
        "n_positions": "max_position_embeddings",
        "layer_norm_epsilon": "rms_norm_eps",
        "rotary_dim": lambda c: int(c.rotary_pct * c.head_dim),
    },
    "phi": {
        "vocab_size": "vocab_size", "hidden_size": "hidden_size",
        "intermediate_size": "intermediate_size",
        "num_hidden_layers": "num_hidden_layers",
        "num_attention_heads": "num_attention_heads",
        "max_position_embeddings": "max_position_embeddings",
        "layer_norm_eps": "rms_norm_eps", "rope_theta": "rope_theta",
        "partial_rotary_factor": "rotary_pct",
    },
    "falcon": {
        "vocab_size": "vocab_size", "hidden_size": "hidden_size",
        "ffn_hidden_size": "intermediate_size",
        "num_hidden_layers": "num_hidden_layers",
        "num_attention_heads": "num_attention_heads",
        "multi_query": lambda c: c.num_key_value_heads == 1,
        "parallel_attn": "use_parallel_residual",
        "new_decoder_architecture": "parallel_dual_ln",
        "num_kv_heads": "num_key_value_heads",
        "max_position_embeddings": "max_position_embeddings",
        "layer_norm_epsilon": "rms_norm_eps", "rope_theta": "rope_theta",
    },
    "opt": {
        "vocab_size": "vocab_size", "hidden_size": "hidden_size",
        "ffn_dim": "intermediate_size",
        "num_hidden_layers": "num_hidden_layers",
        "num_attention_heads": "num_attention_heads",
        "max_position_embeddings": "max_position_embeddings",
        "do_layer_norm_before": lambda c: True,
    },
    "qwen": {
        "vocab_size": "vocab_size", "hidden_size": "hidden_size",
        # QWen stores intermediate_size PRE-halving (see ModelConfig)
        "intermediate_size": lambda c: 2 * c.intermediate_size,
        "num_hidden_layers": "num_hidden_layers",
        "num_attention_heads": "num_attention_heads",
        "kv_channels": "head_dim",
        "seq_length": "max_position_embeddings",
        "layer_norm_epsilon": "rms_norm_eps",
        "rotary_emb_base": "rope_theta",
        "tie_word_embeddings": "tie_word_embeddings",
    },
}


def _model_type(cfg: ModelConfig) -> str:
    if cfg.arch in _HF_CONFIG_KEYS:
        return cfg.arch
    return ("mixtral" if cfg.arch == "mixtral" else
            "baichuan" if cfg.arch == "baichuan" else "llama")


def hf_config_dict(cfg: ModelConfig) -> dict:
    keys = _HF_CONFIG_KEYS.get(cfg.arch, _LLAMA_KEYS)
    out = {"model_type": _model_type(cfg)}
    for hf_key, src in keys.items():
        out[hf_key] = src(cfg) if callable(src) else getattr(cfg, src)
    return out


def _parse_size(size) -> int:
    if isinstance(size, int):
        return size
    s = str(size).strip().upper()
    for suffix, mult in (("GB", 1 << 30), ("MB", 1 << 20), ("KB", 1 << 10),
                         ("B", 1)):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def _save_sharded(flat: Dict[str, np.ndarray], save_dir: str,
                  max_bytes: int) -> None:
    """HF-layout sharded save: size-capped ``model-XXXXX-of-YYYYY``
    files + ``model.safetensors.index.json``; single ``model.safetensors``
    when everything fits in one shard (reference ``quantizer.py:718-756``
    saves 10GB accelerate shards; hf_import reads this layout back)."""
    total = sum(int(v.nbytes) for v in flat.values())
    index_path = os.path.join(save_dir, "model.safetensors.index.json")

    def _drop_stale_shards(keep: set):
        import glob as _glob
        for p in _glob.glob(os.path.join(save_dir,
                                         "model-*-of-*.safetensors")):
            if os.path.basename(p) not in keep:
                os.remove(p)

    if total <= max_bytes:
        save_file(flat, os.path.join(save_dir, "model.safetensors"))
        if os.path.exists(index_path):
            os.remove(index_path)
        _drop_stale_shards(set())        # sharded -> single re-save
        return
    shards = [{}]
    cur = 0
    for k, v in flat.items():
        if shards[-1] and cur + int(v.nbytes) > max_bytes:
            shards.append({})
            cur = 0
        shards[-1][k] = v
        cur += int(v.nbytes)
    n = len(shards)
    weight_map = {}
    for i, sh in enumerate(shards, 1):
        fn = f"model-{i:05d}-of-{n:05d}.safetensors"
        save_file(sh, os.path.join(save_dir, fn))
        weight_map.update({k: fn for k in sh})
    single = os.path.join(save_dir, "model.safetensors")
    if os.path.exists(single):
        os.remove(single)
    _drop_stale_shards(set(weight_map.values()))   # shrunk re-save
    with open(index_path, "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=2)


def save_quantized(cfg: ModelConfig, params: Dict[str, Any],
                   quant_config: dict, save_dir: str,
                   max_shard_size="10GB") -> None:
    os.makedirs(save_dir, exist_ok=True)
    flat = _flatten(params, quant_config)
    _save_sharded(flat, save_dir, _parse_size(max_shard_size))
    hf_cfg = hf_config_dict(cfg)
    hf_cfg["quantization_config"] = quant_config
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    with open(os.path.join(save_dir, QUIP_CONFIG), "w") as f:
        json.dump(quant_config, f, indent=2)


def load_quant_config(save_dir: str) -> dict:
    cfg_path = os.path.join(save_dir, "config.json")
    with open(cfg_path) as f:
        hf_cfg = json.load(f)
    if "quantization_config" in hf_cfg:
        return hf_cfg["quantization_config"]
    with open(os.path.join(save_dir, QUIP_CONFIG)) as f:
        return json.load(f)


def _build_qlinear(tensors: Dict[str, np.ndarray], name: str,
                   qcfg: dict) -> QuantLinearParams:
    from ..parallel.sharding import role_of
    tp = int(qcfg.get("tp_shards", 1))
    role = role_of(name)
    shards_left = tp if (tp > 1 and role == "row") else 1
    shards_right = tp if (tp > 1 and role == "col") else 1
    cb = get_codebook(qcfg["codebook"],
                      qcfg.get("opt_resid_scale", -1)
                      if qcfg.get("opt_resid_scale", -1) > 0 else None)
    packed = tensors[name + ".Qidxs"]
    SU = tensors.get(name + ".SU")
    SV = tensors.get(name + ".SV")
    Wscale = tensors[name + ".Wscale"]
    bias = tensors.get(name + ".bias")
    had_left = tensors.get(name + ".had_left")
    had_right = tensors.get(name + ".had_right")

    q_out = packed.shape[0]
    packsz = cb.packsz
    q_in = int(packed.shape[1] * cb.codesz * packsz)
    in_f = SU.shape[0] if SU is not None else q_in
    out_f = SV.shape[0] if SV is not None else q_out
    qt = from_checkpoint_idxs(cb, packed, q_out, q_in)

    use_rand = qcfg.get("use_rand", True)
    if had_left is not None:
        K_left = had_left.shape[0]
    else:
        spec = get_hadK(in_f, use_rand=False,
                        shards=shards_left) if not use_rand else None
        if spec is not None and spec.K > 1:
            K_left, had_left = spec.K, spec.hadK
        else:
            K_left = 1
    if had_right is not None:
        K_right = had_right.shape[0]
    else:
        spec = get_hadK(out_f, use_rand=False,
                        shards=shards_right) if not use_rand else None
        if spec is not None and spec.K > 1:
            K_right, had_right = spec.K, spec.hadK
        else:
            K_right = 1

    per_channel = bool(qcfg.get("per_channel", False)) and Wscale.ndim == 1
    wscale_float = float(np.mean(Wscale))
    Wn = (jnp.asarray((Wscale / np.mean(Wscale)).astype(np.float32))
          if per_channel else None)

    def keep_signs(v):
        if v is None:
            return None
        if np.all(v == 1.0):
            return None  # load-time drop (quantizer.py:840-844)
        return jnp.asarray(v.astype(np.float32))

    return QuantLinearParams(
        qweight=qt, Wscale=Wn,
        SU=keep_signs(SU), SV=keep_signs(SV),
        bias=None if bias is None else jnp.asarray(bias.astype(np.float32)),
        had_left=None if had_left is None else jnp.asarray(
            np.asarray(had_left, np.float32)),
        had_right=None if had_right is None else jnp.asarray(
            np.asarray(had_right, np.float32)),
        in_features=in_f, out_features=out_f,
        K_left=K_left, K_right=K_right, q_in=q_in, q_out=q_out,
        per_channel=per_channel, wscale_float=wscale_float,
        shards_left=shards_left, shards_right=shards_right)


def load_quantized(save_dir: str, dtype=jnp.float32
                   ) -> Tuple[ModelConfig, Dict[str, Any], dict]:
    """Load a quantized checkpoint -> (model config, params pytree, qconfig).

    Parity: reference load_quantized_model (``quantizer.py:779-848``) minus
    the CUDA requirement. ``save_dir`` may be a HF-hub model id (resolved
    via snapshot_download, reference quantizer.py:760-776,803).
    """
    from .hf_import import resolve_model_path
    save_dir = resolve_model_path(save_dir)
    cfg = ModelConfig.from_pretrained_dir(save_dir)
    qcfg = load_quant_config(save_dir)

    from .hf_import import _open_all_tensors
    tensors = _open_all_tensors(save_dir)  # single file or sharded index

    qlinear_names = sorted({k[: -len(".Qidxs")] for k in tensors
                            if k.endswith(".Qidxs")})

    if cfg.arch == "gpt2":
        return cfg, _load_gpt2(cfg, tensors, qlinear_names, qcfg,
                               dtype), qcfg
    if cfg.arch == "gpt_neox":
        return cfg, _load_gpt_neox(cfg, tensors, qlinear_names, qcfg,
                                   dtype), qcfg
    if cfg.arch == "opt":
        return cfg, _load_opt(cfg, tensors, qlinear_names, qcfg,
                              dtype), qcfg
    if cfg.arch == "falcon":
        return cfg, _load_falcon(cfg, tensors, qlinear_names, qcfg,
                                 dtype), qcfg
    if cfg.arch == "phi":
        return cfg, _load_phi(cfg, tensors, qlinear_names, qcfg,
                              dtype), qcfg
    if cfg.arch == "gptj":
        return cfg, _load_gptj(cfg, tensors, qlinear_names, qcfg,
                               dtype), qcfg
    if cfg.arch == "qwen":
        return cfg, _load_qwen(cfg, tensors, qlinear_names, qcfg,
                               dtype), qcfg

    # Yi checkpoints name the block norms ln1/ln2 (reference
    # utils.py:186-191); normalize to llama naming
    tensors = _yi_aliases(tensors)

    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jnp.asarray(
            tensors["model.embed_tokens.weight"], dtype=dtype)},
        "norm": {"weight": jnp.asarray(tensors["model.norm.weight"],
                                       dtype=dtype)},
        "layers": [],
    }
    def linear_or_dense(name):
        if name in qlinear_names:
            return _build_qlinear(tensors, name, qcfg)
        d = {"weight": jnp.asarray(tensors[name + ".weight"], dtype=dtype)}
        d["bias"] = (jnp.asarray(tensors[name + ".bias"], dtype=dtype)
                     if name + ".bias" in tensors else None)
        return d

    if "lm_head.weight" in tensors or "lm_head.Qidxs" in tensors:
        params["lm_head"] = linear_or_dense("lm_head")

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        blk: Dict[str, Any] = {
            "input_layernorm": {"weight": jnp.asarray(
                tensors[f"{p}.input_layernorm.weight"], dtype=dtype)},
            "post_attention_layernorm": {"weight": jnp.asarray(
                tensors[f"{p}.post_attention_layernorm.weight"],
                dtype=dtype)},
            "self_attn": {
                x: linear_or_dense(f"{p}.self_attn.{x}")
                for x in (("W_pack", "o_proj") if cfg.arch == "baichuan"
                          else ("q_proj", "k_proj", "v_proj", "o_proj"))
            },
        }
        if cfg.arch == "mixtral":
            blk["block_sparse_moe"] = {
                "gate": linear_or_dense(f"{p}.block_sparse_moe.gate"),
                "experts": [
                    {w: linear_or_dense(
                        f"{p}.block_sparse_moe.experts.{e}.{w}")
                     for w in ("w1", "w2", "w3")}
                    for e in range(cfg.num_local_experts)
                ],
            }
        else:
            blk["mlp"] = {
                x: linear_or_dense(f"{p}.mlp.{x}")
                for x in ("gate_proj", "up_proj", "down_proj")
            }
        params["layers"].append(blk)
    return cfg, params, qcfg


def _yi_aliases(tensors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename Yi-style ``ln1``/``ln2`` block norms to llama's
    ``input_layernorm``/``post_attention_layernorm`` (the models are
    otherwise identical; reference merge map /root/reference/
    utils.py:186-191 keys off the ln1/ln2 names)."""
    if not any(".ln1.weight" in k for k in tensors):
        return tensors
    out = {}
    for k, v in tensors.items():
        k = k.replace(".ln1.", ".input_layernorm.").replace(
            ".ln2.", ".post_attention_layernorm.")
        out[k] = v
    return out


def _load_qwen(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
               ) -> Dict[str, Any]:
    linear_or_dense, _ = _loaders(tensors, qlinear_names, qcfg, dtype)

    def rms(name):
        return {"weight": jnp.asarray(tensors[name + ".weight"],
                                      dtype=dtype)}

    params: Dict[str, Any] = {
        "wte": {"weight": jnp.asarray(tensors["model.wte.weight"],
                                      dtype=dtype)},
        "ln_f": rms("model.ln_f"),
        "layers": [],
    }
    if "lm_head.weight" in tensors or "lm_head" in qlinear_names:
        params["lm_head"] = linear_or_dense("lm_head")
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "ln_1": rms(f"{p}.ln_1"),
            "ln_2": rms(f"{p}.ln_2"),
            "attn": {"c_attn": linear_or_dense(f"{p}.attn.c_attn"),
                     "c_proj": linear_or_dense(f"{p}.attn.c_proj")},
            "mlp": {"w1": linear_or_dense(f"{p}.mlp.w1"),
                    "w2": linear_or_dense(f"{p}.mlp.w2"),
                    "c_proj": linear_or_dense(f"{p}.mlp.c_proj")},
        })
    return params


def _load_gpt2(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
               ) -> Dict[str, Any]:
    def linear_or_dense(name):
        if name in qlinear_names:
            return _build_qlinear(tensors, name, qcfg)
        d = {"weight": jnp.asarray(tensors[name + ".weight"], dtype=dtype)}
        d["bias"] = (jnp.asarray(tensors[name + ".bias"], dtype=dtype)
                     if name + ".bias" in tensors else None)
        return d

    def ln(name):
        return {"weight": jnp.asarray(tensors[name + ".weight"],
                                      dtype=dtype),
                "bias": jnp.asarray(tensors[name + ".bias"], dtype=dtype)}

    params: Dict[str, Any] = {
        "wte": {"weight": jnp.asarray(tensors["model.wte.weight"],
                                      dtype=dtype)},
        "wpe": {"weight": jnp.asarray(tensors["model.wpe.weight"],
                                      dtype=dtype)},
        "ln_f": ln("model.ln_f"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "ln_1": ln(f"{p}.ln_1"),
            "ln_2": ln(f"{p}.ln_2"),
            "attn": {"c_attn": linear_or_dense(f"{p}.attn.c_attn"),
                     "c_proj": linear_or_dense(f"{p}.attn.c_proj")},
            "mlp": {"c_fc": linear_or_dense(f"{p}.mlp.c_fc"),
                    "c_proj": linear_or_dense(f"{p}.mlp.c_proj")},
        })
    return params


def _loaders(tensors, qlinear_names, qcfg, dtype):
    def linear_or_dense(name):
        if name in qlinear_names:
            return _build_qlinear(tensors, name, qcfg)
        d = {"weight": jnp.asarray(tensors[name + ".weight"], dtype=dtype)}
        d["bias"] = (jnp.asarray(tensors[name + ".bias"], dtype=dtype)
                     if name + ".bias" in tensors else None)
        return d

    def ln(name):
        return {"weight": jnp.asarray(tensors[name + ".weight"],
                                      dtype=dtype),
                "bias": jnp.asarray(tensors[name + ".bias"], dtype=dtype)}

    return linear_or_dense, ln


def _load_gpt_neox(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
                   ) -> Dict[str, Any]:
    linear_or_dense, ln = _loaders(tensors, qlinear_names, qcfg, dtype)
    params: Dict[str, Any] = {
        "embed_in": {"weight": jnp.asarray(
            tensors["model.embed_in.weight"], dtype=dtype)},
        "final_layer_norm": ln("model.final_layer_norm"),
        "embed_out": linear_or_dense("model.embed_out"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "input_layernorm": ln(f"{p}.input_layernorm"),
            "post_attention_layernorm": ln(
                f"{p}.post_attention_layernorm"),
            "attention": {
                "query_key_value": linear_or_dense(
                    f"{p}.attention.query_key_value"),
                "dense": linear_or_dense(f"{p}.attention.dense")},
            "mlp": {
                "dense_h_to_4h": linear_or_dense(
                    f"{p}.mlp.dense_h_to_4h"),
                "dense_4h_to_h": linear_or_dense(
                    f"{p}.mlp.dense_4h_to_h")},
        })
    return params


def _load_opt(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
              ) -> Dict[str, Any]:
    linear_or_dense, ln = _loaders(tensors, qlinear_names, qcfg, dtype)
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jnp.asarray(
            tensors["model.embed_tokens.weight"], dtype=dtype)},
        "embed_positions": {"weight": jnp.asarray(
            tensors["model.embed_positions.weight"], dtype=dtype)},
        "final_layer_norm": ln("model.final_layer_norm"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "self_attn_layer_norm": ln(f"{p}.self_attn_layer_norm"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
            "self_attn": {
                x: linear_or_dense(f"{p}.self_attn.{x}")
                for x in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "fc1": linear_or_dense(f"{p}.fc1"),
            "fc2": linear_or_dense(f"{p}.fc2"),
        })
    return params


def _load_falcon(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
                 ) -> Dict[str, Any]:
    linear_or_dense, ln = _loaders(tensors, qlinear_names, qcfg, dtype)
    params: Dict[str, Any] = {
        "word_embeddings": {"weight": jnp.asarray(
            tensors["model.word_embeddings.weight"], dtype=dtype)},
        "ln_f": ln("model.ln_f"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        blk = {
            "self_attention": {
                "query_key_value": linear_or_dense(
                    f"{p}.self_attention.query_key_value"),
                "dense": linear_or_dense(f"{p}.self_attention.dense")},
            "mlp": {
                "dense_h_to_4h": linear_or_dense(
                    f"{p}.mlp.dense_h_to_4h"),
                "dense_4h_to_h": linear_or_dense(
                    f"{p}.mlp.dense_4h_to_h")},
        }
        if cfg.parallel_dual_ln:
            blk["ln_attn"] = ln(f"{p}.ln_attn")
            blk["ln_mlp"] = ln(f"{p}.ln_mlp")
        else:
            blk["input_layernorm"] = ln(f"{p}.input_layernorm")
            if f"{p}.post_attention_layernorm.weight" in tensors:
                blk["post_attention_layernorm"] = ln(
                    f"{p}.post_attention_layernorm")
        params["layers"].append(blk)
    return params


def _load_phi(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
              ) -> Dict[str, Any]:
    linear_or_dense, ln = _loaders(tensors, qlinear_names, qcfg, dtype)
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": jnp.asarray(
            tensors["model.embed_tokens.weight"], dtype=dtype)},
        "final_layernorm": ln("model.final_layernorm"),
        "lm_head": linear_or_dense("lm_head"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "input_layernorm": ln(f"{p}.input_layernorm"),
            "self_attn": {x: linear_or_dense(f"{p}.self_attn.{x}")
                          for x in ("q_proj", "k_proj", "v_proj",
                                    "dense")},
            "mlp": {"fc1": linear_or_dense(f"{p}.mlp.fc1"),
                    "fc2": linear_or_dense(f"{p}.mlp.fc2")},
        })
    return params


def _load_gptj(cfg: ModelConfig, tensors, qlinear_names, qcfg, dtype
               ) -> Dict[str, Any]:
    linear_or_dense, ln = _loaders(tensors, qlinear_names, qcfg, dtype)
    params: Dict[str, Any] = {
        "wte": {"weight": jnp.asarray(tensors["model.wte.weight"],
                                      dtype=dtype)},
        "ln_f": ln("model.ln_f"),
        "lm_head": linear_or_dense("lm_head"),
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        params["layers"].append({
            "ln_1": ln(f"{p}.ln_1"),
            "attn": {x: linear_or_dense(f"{p}.attn.{x}")
                     for x in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "mlp": {"fc_in": linear_or_dense(f"{p}.mlp.fc_in"),
                    "fc_out": linear_or_dense(f"{p}.mlp.fc_out")},
        })
    return params
