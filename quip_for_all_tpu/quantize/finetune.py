"""Finetuning of quantized models: block-wise MSE + end-to-end CE.

Parity target: the reference's two finetune passes inside quantize_model
(``quantizer.py:501-560`` block-wise, ``quantizer.py:597-702`` end-to-end)
and its two-LR Adam over SU/SV vs other params (``utils.py:210-232``).
Trainable leaves are addressed as a flat {path: array} dict (a pytree), so
optax.multi_transform labels by path suffix and the frozen integer code
planes never enter autodiff.
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..nn.qlinear import QuantLinearParams

logger = logging.getLogger(__name__)

FlatParams = Dict[str, jax.Array]


def collect_trainable(tree: Any, prefix: str = "",
                      train_dense: bool = True) -> FlatParams:
    """Trainable leaves: SU/SV of QuantLinears, dense linear weights/biases,
    norm weights (the reference trains SU/SV + not-yet-/un-quantized float
    weights; codes and Hadamard factors stay frozen)."""
    out: FlatParams = {}

    def walk(node, name):
        if isinstance(node, QuantLinearParams):
            if node.SU is not None:
                out[f"{name}.SU"] = node.SU
            if node.SV is not None:
                out[f"{name}.SV"] = node.SV
            if node.bias is not None:
                out[f"{name}.bias"] = node.bias
            return
        if isinstance(node, dict):
            if "weight" in node and train_dense:
                out[f"{name}.weight"] = node["weight"]
                if node.get("bias") is not None:
                    out[f"{name}.bias"] = node["bias"]
                return
            for k, v in node.items():
                walk(v, f"{name}.{k}" if name else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{name}.{i}")

    walk(tree, prefix)
    # de-alias: builders may share one device buffer across several tree
    # positions (e.g. the fast random builder hands q/k/v the SAME SU
    # array so fuse_for_inference's sharable() check is an identity
    # test). Trainable leaves must be independent buffers — a donating
    # train step would otherwise donate one buffer twice — and training
    # them separately matches the per-layer-SU semantics of the
    # reference (each QuantLinear owns its SU/SV Parameters).
    # NOTE: dedup must key on the underlying BUFFER, not the python
    # object: jax.device_put/jnp.copy of an immutable buffer may return a
    # distinct Array aliasing the same storage (XLA elides the copy), and
    # a donating train step then hits "donate the same buffer twice". A
    # host round-trip guarantees a fresh buffer; the deduped leaves are
    # small vectors (SU/SV/norm weights).
    import numpy as _np

    import jax as _jax

    def _ptr(v):
        try:
            return v.addressable_shards[0].data.unsafe_buffer_pointer()
        except Exception:  # noqa: BLE001 — tracers/np arrays: no dedup
            return None

    seen: set = set()
    for k, v in out.items():
        p = _ptr(v)
        if p is None:
            continue
        if p in seen and hasattr(v, "sharding"):
            out[k] = _jax.device_put(_np.asarray(v), v.sharding)
        else:
            seen.add(p)
    return out


def apply_trainable(tree: Any, flat: FlatParams, prefix: str = "") -> Any:
    """Return a copy of tree with flat[path] substituted back in."""
    import dataclasses as dc

    def walk(node, name):
        if isinstance(node, QuantLinearParams):
            reps = {}
            for f in ("SU", "SV", "bias"):
                key = f"{name}.{f}"
                if key in flat:
                    reps[f] = flat[key]
            return dc.replace(node, **reps) if reps else node
        if isinstance(node, dict):
            if "weight" in node and f"{name}.weight" in flat:
                new = dict(node)
                new["weight"] = flat[f"{name}.weight"]
                if f"{name}.bias" in flat:
                    new["bias"] = flat[f"{name}.bias"]
                return new
            return {k: walk(v, f"{name}.{k}" if name else k)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, f"{name}.{i}") for i, v in enumerate(node))
        return node

    return walk(tree, prefix)


def make_susv_optimizer(ft_susv_lr: float, ft_lr: float
                        ) -> optax.GradientTransformation:
    """Two-LR Adam (parity: utils.py:222-232)."""
    def label(flat: FlatParams):
        return {k: ("susv" if k.endswith(".SU") or k.endswith(".SV")
                    else "other") for k in flat}
    return optax.multi_transform(
        {"susv": optax.adam(ft_susv_lr), "other": optax.adam(ft_lr)}, label)


def finetune_block(cfg, blk: Any, batches_in: List[np.ndarray],
                   batches_out: List[np.ndarray], cos, sin, mask,
                   *, ft_susv_lr: float, ft_lr: float, epochs: int,
                   valid_frac: int, early_stop: int,
                   update_freq: int = 1) -> Any:
    """Block-wise MSE finetune (parity: quantizer.py:501-560). batches_out
    are the float block's outputs (targets). Returns the tuned block."""
    import dataclasses as dc

    from ..models import llama as M
    from ..nn.qlinear import calc_weight

    def set_cache(node, on):
        if isinstance(node, QuantLinearParams):
            cache = calc_weight(node, dtype=jnp.float32) if on else None
            return dc.replace(node, W_cache=cache)
        if isinstance(node, dict):
            return {k: set_cache(v, on) for k, v in node.items()}
        if isinstance(node, list):
            return [set_cache(v, on) for v in node]
        return node

    # cache dense weights once (the reference's calc_weight cache,
    # quantizer.py:505-507) — constant w.r.t. the trained SU/SV
    blk = set_cache(blk, True)

    flat = collect_trainable(blk)
    if not flat:
        return set_cache(blk, False)
    opt = make_susv_optimizer(ft_susv_lr, ft_lr)
    opt_state = opt.init(flat)

    n_valid = max(1, len(batches_in) // max(valid_frac, 1)) \
        if valid_frac else 0
    train_in, train_out = batches_in[:len(batches_in) - n_valid], \
        batches_out[:len(batches_in) - n_valid]
    valid_in, valid_out = batches_in[len(batches_in) - n_valid:], \
        batches_out[len(batches_in) - n_valid:]

    def loss_fn(flat, x, target):
        blk_t = apply_trainable(blk, flat)
        y, _, _ = M.block_apply(cfg, blk_t, x, cos, sin, attn_mask=mask,
                                linear_kw={"training": True})
        return jnp.mean((y - target) ** 2)

    @jax.jit
    def train_step(flat, opt_state, x, target):
        loss, grads = jax.value_and_grad(loss_fn)(flat, x, target)
        updates, opt_state = opt.update(grads, opt_state, flat)
        return optax.apply_updates(flat, updates), opt_state, loss

    eval_loss = jax.jit(loss_fn)

    def valid_loss(flat):
        if not valid_in:
            return float("inf")
        return float(np.mean([eval_loss(flat,
                                        jnp.asarray(a, jnp.float32),
                                        jnp.asarray(b, jnp.float32))
                              for a, b in zip(valid_in, valid_out)]))

    best = valid_loss(flat)
    best_flat = flat
    worse = 0
    for epoch in range(epochs):
        for a, b in zip(train_in, train_out):
            flat, opt_state, _ = train_step(flat, opt_state,
                                            jnp.asarray(a, jnp.float32),
                                            jnp.asarray(b, jnp.float32))
        cur = valid_loss(flat)
        if cur < best:
            best, best_flat, worse = cur, flat, 0
        else:
            worse += 1
            if worse >= early_stop:
                break
    return set_cache(apply_trainable(blk, best_flat), False)


def make_train_step(cfg, optimizer: optax.GradientTransformation,
                    frozen_params: Any) -> Callable:
    """End-to-end CE training step over trainable leaves — used by the
    e2e finetune (quantizer.py:597-702) and the multi-chip dry run.

    Returns step(flat, opt_state, ids (B,S), targets (B,S,V softmax or
    (B,S) int)) -> (flat, opt_state, loss).
    """
    from ..models import llama as M

    def loss_fn(flat, ids, targets):
        params = apply_trainable(frozen_params, flat)
        logits, _ = M.model_apply(cfg, params, ids,
                                  linear_kw={"training": True})
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if targets.ndim == logits.ndim:   # soft targets (reference e2e ft)
            return -(targets * logp).sum(-1).mean()
        oh = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
        return -(oh * logp).sum(-1).mean()

    def step(flat, opt_state, ids, targets):
        loss, grads = jax.value_and_grad(loss_fn)(flat, ids, targets)
        updates, opt_state = optimizer.update(grads, opt_state, flat)
        return optax.apply_updates(flat, updates), opt_state, loss

    return step
