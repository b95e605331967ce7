"""LoRA finetune driver: causal-LM training loop over adapter weights on a
frozen quantized model.

Parity target: ``/root/reference/example_finetune.py:45-113`` (alpaca data
prep + HF Trainer over PEFT-wrapped QuantLinears). TPU-native shape: the
loop is a jitted optax step over ONLY the lora_A/lora_B leaves
(nn/lora.py); the quantized base never takes gradients, so each step is
one forward through the fused decode path + adapter rank-r matmuls.

Adapters round-trip through a standalone safetensors file, so a base
checkpoint can serve many adapter sets (the PEFT layout's role).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.registry import get_arch
from ..nn.lora import (DEFAULT_TARGETS, add_lora, apply_lora_trainable,
                       collect_lora_trainable)

logger = logging.getLogger(__name__)

ADAPTER_FILE = "lora_adapters.safetensors"
ADAPTER_CONFIG = "lora_config.json"


def causal_lm_loss(cfg: ModelConfig, params: Dict[str, Any],
                   ids: jax.Array) -> jax.Array:
    """Next-token CE over a (B, S) batch (labels = ids shifted)."""
    ARCH = get_arch(cfg)
    logits, _ = ARCH.model_apply(cfg, params, ids[:, :-1],
                                 linear_kw={"training": False})
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -ll.mean()


def train_lora(cfg: ModelConfig, params: Dict[str, Any],
               train_tokens: np.ndarray,
               valid_tokens: Optional[np.ndarray] = None,
               rank: int = 8, alpha: float = 16.0,
               targets=DEFAULT_TARGETS, lr: float = 1e-4,
               epochs: int = 3, batch_size: int = 4,
               weight_decay: float = 0.0, early_stop: int = 3,
               seed: int = 0) -> Dict[str, Any]:
    """Add LoRA adapters and train them; returns params with trained
    adapters attached. Early-stops on validation loss when
    valid_tokens is given (reference Trainer semantics, best-epoch kept).
    """
    import optax

    params = add_lora(params, rank=rank, alpha=alpha, targets=targets,
                      seed=seed)
    flat = collect_lora_trainable(params["layers"], "layers")
    if not flat:
        raise ValueError(f"no linear matched LoRA targets {targets}")
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(flat)

    def loss_fn(flat, ids):
        layers = apply_lora_trainable(params["layers"], flat, "layers")
        p2 = dict(params)
        p2["layers"] = layers
        return causal_lm_loss(cfg, p2, ids)

    @jax.jit
    def step(flat, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(flat, ids)
        upd, opt_state = opt.update(grads, opt_state, flat)
        return optax.apply_updates(flat, upd), opt_state, loss

    eval_loss = jax.jit(loss_fn)

    def batches(toks):
        n = toks.shape[0] // batch_size
        for i in range(n):
            yield jnp.asarray(toks[i * batch_size:(i + 1) * batch_size])

    def vloss(flat):
        ls = [float(eval_loss(flat, b)) for b in batches(valid_tokens)]
        return float(np.mean(ls))

    best = vloss(flat) if valid_tokens is not None else np.inf
    best_flat, worse = flat, 0
    if valid_tokens is not None:
        logger.info("lora initial valid loss %.5f", best)
    for ep in range(epochs):
        tl = []
        for b in batches(train_tokens):
            flat, opt_state, loss = step(flat, opt_state, b)
            tl.append(float(loss))
        if valid_tokens is None:
            best_flat = flat
            logger.info("lora epoch %d train loss %.5f", ep,
                        float(np.mean(tl)))
            continue
        cur = vloss(flat)
        logger.info("lora epoch %d train %.5f valid %.5f", ep,
                    float(np.mean(tl)), cur)
        if cur < best:
            best, best_flat, worse = cur, flat, 0
        else:
            worse += 1
            if worse >= early_stop:
                break
    params["layers"] = apply_lora_trainable(params["layers"], best_flat,
                                            "layers")
    return params


# ------------------------------------------------------------- adapter IO

def save_lora(params: Dict[str, Any], save_dir: str,
              rank: int, alpha: float, targets=DEFAULT_TARGETS) -> None:
    """Write trained adapters (+ config) next to / separate from the base
    checkpoint."""
    from safetensors.numpy import save_file

    flat = collect_lora_trainable(params["layers"], "layers")
    os.makedirs(save_dir, exist_ok=True)
    save_file({k: np.asarray(v) for k, v in flat.items()},
              os.path.join(save_dir, ADAPTER_FILE))
    with open(os.path.join(save_dir, ADAPTER_CONFIG), "w") as f:
        json.dump({"rank": rank, "alpha": alpha,
                   "targets": list(targets)}, f, indent=2)


PEFT_ADAPTER_FILE = "adapter_model.safetensors"
PEFT_ADAPTER_CONFIG = "adapter_config.json"
# PEFT key layout for a causal LM: LoraModel wraps the HF model as
# `base_model.model`, whose decoder stack lives under `model.layers`
# (reference flow: /root/reference/example_finetune.py:22-34 trains
# standard PEFT adapters on the quantized model)
_PEFT_PREFIX = "base_model.model.model."


def export_peft(params: Dict[str, Any], save_dir: str, rank: int,
                alpha: float, targets=DEFAULT_TARGETS,
                base_model_name_or_path: str = "") -> None:
    """Write the trained adapters in standard PEFT layout
    (adapter_model.safetensors + adapter_config.json) so they load into
    the reference stack — and any other PEFT consumer — unchanged.
    Tensor conventions already agree: lora_A (r, in), lora_B (out, r),
    scaling = alpha / r."""
    from safetensors.numpy import save_file

    flat = collect_lora_trainable(params["layers"], "layers")
    tensors = {_PEFT_PREFIX + k + ".weight": np.asarray(v, np.float32)
               for k, v in flat.items()}
    os.makedirs(save_dir, exist_ok=True)
    save_file(tensors, os.path.join(save_dir, PEFT_ADAPTER_FILE))
    with open(os.path.join(save_dir, PEFT_ADAPTER_CONFIG), "w") as f:
        json.dump({
            "peft_type": "LORA",
            "task_type": "CAUSAL_LM",
            "r": rank,
            "lora_alpha": alpha,
            "lora_dropout": 0.0,
            "target_modules": sorted(set(targets)),
            "base_model_name_or_path": base_model_name_or_path,
            "bias": "none",
            "fan_in_fan_out": False,
            "inference_mode": True,
        }, f, indent=2)


def import_peft(params: Dict[str, Any], peft_dir: str) -> Dict[str, Any]:
    """Attach adapters from a standard PEFT directory (as produced by the
    reference's example_finetune.py, or by export_peft) to a freshly
    loaded base model's params."""
    from safetensors.numpy import load_file

    with open(os.path.join(peft_dir, PEFT_ADAPTER_CONFIG)) as f:
        acfg = json.load(f)
    if acfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"not a LoRA adapter: {acfg.get('peft_type')}")
    params = add_lora(params, rank=acfg["r"], alpha=acfg["lora_alpha"],
                      targets=tuple(acfg["target_modules"]))
    raw = load_file(os.path.join(peft_dir, PEFT_ADAPTER_FILE))
    flat = {}
    for k, v in raw.items():
        key = k
        for pre in (_PEFT_PREFIX, "base_model.model."):
            if key.startswith(pre):
                key = key[len(pre):]
                break
        if key.endswith(".weight"):
            key = key[: -len(".weight")]
        flat[key] = jnp.asarray(v)
    have = collect_lora_trainable(params["layers"], "layers")
    missing = set(have) - set(flat)
    if missing:
        raise ValueError(
            f"PEFT adapter missing keys: {sorted(missing)[:4]}")
    params["layers"] = apply_lora_trainable(params["layers"], flat,
                                            "layers")
    return params


def load_lora(params: Dict[str, Any], save_dir: str) -> Dict[str, Any]:
    """Attach saved adapters to a freshly loaded base model's params."""
    from safetensors.numpy import load_file

    with open(os.path.join(save_dir, ADAPTER_CONFIG)) as f:
        acfg = json.load(f)
    params = add_lora(params, rank=acfg["rank"], alpha=acfg["alpha"],
                      targets=tuple(acfg["targets"]))
    flat = load_file(os.path.join(save_dir, ADAPTER_FILE))
    flat = {k: jnp.asarray(v) for k, v in flat.items()}
    have = collect_lora_trainable(params["layers"], "layers")
    missing = set(have) - set(flat)
    if missing:
        raise ValueError(f"adapter file missing keys: {sorted(missing)[:4]}")
    params["layers"] = apply_lora_trainable(params["layers"], flat,
                                            "layers")
    return params
