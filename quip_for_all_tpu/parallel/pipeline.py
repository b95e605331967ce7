"""Pipeline parallelism: GPipe-style microbatched block pipeline over a
"pp" mesh axis.

The reference's ONLY multi-device mode is accelerate's sequential layer
placement (`device_map="auto"`, one device active at a time —
/root/reference/quantizer.py:827-833, SURVEY.md §2.4). The TPU-native
replacement is a real pipeline: transformer blocks are STACKED along a
leading layer axis, that axis is sharded over the "pp" mesh axis
(shard_map), and M microbatches flow through the P stages with
`lax.ppermute` boundary transfers — P + M - 1 steps, every device busy in
the steady state, activations riding ICI.

Scope: forward (prefill / quantization replay / eval / CE loss). bs=1
token-by-token decode is latency-bound and uses TP instead (the pipeline
would serialize on a single token anyway).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, **kw):
    # jax>=0.7 renamed check_rep -> check_vma; accept either runtime.
    import inspect
    if "check_vma" in inspect.signature(_shard_map).parameters:
        kw["check_vma"] = kw.pop("check_rep", True)
    return _shard_map(f, **kw)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig

__all__ = ["stack_blocks", "unstack_blocks", "make_pp_mesh",
           "shard_stacked_params", "pipeline_forward", "pipeline_logits"]


def stack_blocks(blocks) -> Any:
    """List of L homogeneous block pytrees -> one pytree whose array
    leaves carry a leading (L,) axis. Static dataclass fields
    (QuantLinearParams shapes etc.) must agree across layers."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_blocks(stacked, n_layers: int):
    return [jax.tree_util.tree_map(lambda a: a[i], stacked)
            for i in range(n_layers)]


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())[:pp]
    return Mesh(np.array(devs), ("pp",))


def _stacked_specs(stacked) -> Any:
    """Shard every stacked leaf's leading layer axis over "pp"."""
    return jax.tree_util.tree_map(
        lambda a: P("pp", *([None] * (a.ndim - 1))), stacked)


def shard_stacked_params(stacked, mesh: Mesh):
    specs = _stacked_specs(stacked)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stacked, specs)


def pipeline_forward(cfg: ModelConfig, stacked, x: jax.Array,
                     cos, sin, mesh: Mesh,
                     n_microbatches: int,
                     attn_mask: Optional[jax.Array] = None,
                     linear_kw: Optional[dict] = None) -> jax.Array:
    """Run (B, S, D) activations through all L blocks, pipelined.

    B must divide into n_microbatches equal microbatches; L must divide by
    the mesh's pp size. Returns the (B, S, D) output activations,
    bit-equal (up to reduction order) to sequentially applying the blocks.
    """
    from ..models.registry import get_arch
    ARCH = get_arch(cfg)
    pp = mesh.shape["pp"]
    M = n_microbatches
    B = x.shape[0]
    assert B % M == 0, (B, M)
    mb = B // M
    linear_kw = linear_kw or {}

    def local_stage(local_stacked, h):
        """Apply this device's L/pp consecutive blocks to h."""
        def body(h, blk):
            h, _, _ = ARCH.block_apply(cfg, blk, h, cos, sin,
                                       attn_mask=attn_mask,
                                       linear_kw=linear_kw)
            return h, None
        h, _ = jax.lax.scan(body, h, local_stacked)
        return h

    def pipelined(local_stacked, xs):
        # xs: (M, mb, S, D) replicated; SPMD over the pp axis
        idx = jax.lax.axis_index("pp")
        state = jnp.zeros_like(xs[0])          # activation entering stage
        outputs = jnp.zeros_like(xs)           # filled on the last stage
        n_steps = M + pp - 1

        def step(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t while t < M (garbage after,
            # masked out by the output-slot clamp below)
            feed = xs[jnp.minimum(t, M - 1)]
            h_in = jnp.where(idx == 0, feed, state)
            h_out = local_stage(local_stacked, h_in)
            # the last stage completes microbatch t - (pp - 1)
            slot = t - (pp - 1)
            write = jnp.logical_and(idx == pp - 1, slot >= 0)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(write, h_out, outputs[jnp.maximum(slot, 0)]),
                jnp.maximum(slot, 0), axis=0)
            # boundary transfer: stage i -> i+1 (ring; last->0 ignored)
            state = jax.lax.ppermute(
                h_out, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            step, (state, outputs), jnp.arange(n_steps))
        # outputs live on the last stage only; replicate via psum of a
        # one-hot masked buffer (zeros elsewhere)
        outputs = jnp.where(idx == pp - 1, outputs, 0.0)
        return jax.lax.psum(outputs, "pp")

    xs = x.reshape(M, mb, *x.shape[1:])
    fn = shard_map(pipelined, mesh=mesh,
                   in_specs=(_stacked_specs(stacked), P()),
                   out_specs=P(), check_rep=False)
    out = fn(stacked, xs)
    return out.reshape(B, *x.shape[1:])


def pipeline_logits(cfg: ModelConfig, params: Dict[str, Any],
                    input_ids: jax.Array, mesh: Mesh,
                    n_microbatches: int,
                    stacked=None,
                    linear_kw: Optional[dict] = None,
                    dtype=jnp.float32) -> jax.Array:
    """Full-model forward (embed -> pipelined blocks -> final norm/head)
    returning (B, S, V) logits. `stacked` may be passed pre-sharded
    (shard_stacked_params) to avoid re-stacking per call."""
    from ..models import registry as R
    from ..models.llama import causal_mask

    B, S = input_ids.shape
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    x = R.embed(cfg, params, input_ids, positions, dtype)
    cos, sin = R.rope_tables(cfg, positions[:B // n_microbatches])
    mask = causal_mask(S, S)
    if stacked is None:
        stacked = stack_blocks(params["layers"])
    x = pipeline_forward(cfg, stacked, x, cos, sin, mesh,
                         n_microbatches, attn_mask=mask,
                         linear_kw=linear_kw)
    h = R.final_hidden(cfg, params, x)
    return R.head_logits(cfg, params, h, linear_kw)
