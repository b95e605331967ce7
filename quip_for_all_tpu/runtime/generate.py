"""Static-cache autoregressive generation, jit-once decode.

Parity target: ``/root/reference/example_generate.py`` (HF StaticCache +
torch.compile fullgraph decode loop + sync-free sampling). TPU-native: the
whole token loop is a ``jax.lax.scan`` inside a single jit, the KV cache is
a preallocated pytree carried through the scan (no per-token dispatch at
all), and sampling uses jax.random with Gumbel-max top-k (no host syncs).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as M
from ..models.config import ModelConfig
from ..models.registry import get_arch


def init_kv_caches(cfg: ModelConfig, batch: int, max_len: int,
                   dtype=jnp.bfloat16, quantized: bool = False
                   ) -> List[Tuple[Any, Any]]:
    """Static KV caches; ``quantized=True`` stores int8 codes + per-
    position f32 scales (models/common.py QuantKVCache) — half the
    attention HBM traffic and cache memory of bf16."""
    KV, hd = cfg.num_key_value_heads, cfg.head_dim

    def slab():
        if quantized:
            from ..models.common import QuantKVCache
            return QuantKVCache(
                jnp.zeros((batch, max_len, KV, hd), jnp.int8),
                jnp.zeros((batch, max_len, KV, 1), jnp.float32))
        return jnp.zeros((batch, max_len, KV, hd), dtype)

    return [(slab(), slab()) for _ in range(cfg.num_hidden_layers)]


def sample_token(logits: jax.Array, key, temperature: float, top_k: int
                 ) -> jax.Array:
    """logits (B, V) -> (B,) int32. Greedy when temperature == 0 (parity:
    example_generate.py:9-26, without the .item() sync)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    # Gumbel-max == multinomial without normalizing (sync-free)
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + g, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k",
                     "cache_len", "dtype_str", "kv_quantized"))
def generate(cfg: ModelConfig, params: Dict[str, Any],
             prompt_ids: jax.Array, max_new_tokens: int,
             key: Optional[jax.Array] = None,
             temperature: float = 0.0, top_k: int = 0,
             cache_len: int = 2048, dtype_str: str = "bfloat16",
             kv_quantized: bool = False) -> jax.Array:
    """prompt_ids (B, S) -> (B, S + max_new_tokens) generated ids.
    ``kv_quantized``: int8 KV cache (half the attention HBM reads)."""
    dtype = np.dtype(dtype_str)
    B, S = prompt_ids.shape
    assert S + max_new_tokens <= cache_len, (
        f"prompt ({S}) + max_new_tokens ({max_new_tokens}) exceeds "
        f"cache_len ({cache_len}) — writes would silently clamp")
    if key is None:
        key = jax.random.PRNGKey(0)
    caches = init_kv_caches(cfg, B, cache_len, dtype,
                            quantized=kv_quantized)
    A = get_arch(cfg)
    import inspect
    windowed = "attn_window" in inspect.signature(A.model_apply).parameters

    def win_kw(need: int) -> dict:
        """Static attention window (smallest bucket covering `need` cache
        slots) — positions are statically known here, so attention reads
        exactly the live prefix with no runtime bucket switch."""
        if not windowed:
            return {}
        return {"attn_window": attn_bucket(need, cache_len)}

    # ---- prefill
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    logits, caches = A.model_apply(
        cfg, params, prompt_ids, positions=positions, kv_caches=caches,
        cache_position=0, dtype=dtype, **win_kw(S))
    key, sub = jax.random.split(key)
    next_tok = sample_token(logits[:, -1, :].astype(jnp.float32), sub,
                            temperature, top_k)

    # ---- decode loop (compiled scans; static cache; no host syncs),
    # segmented at the statically known attention-bucket boundaries so
    # each scan body reads a fixed cache prefix
    def make_step(wkw):
        def step(carry, _):
            caches, tok, pos, key = carry
            key, sub = jax.random.split(key)
            positions = pos[:, None]
            logits, caches = A.model_apply(
                cfg, params, tok[:, None], positions=positions,
                kv_caches=caches, cache_position=pos[0], dtype=dtype, **wkw)
            nxt = sample_token(logits[:, -1, :].astype(jnp.float32), sub,
                               temperature, top_k)
            return (caches, nxt, pos + 1, key), nxt
        return step

    pos0 = jnp.full((B,), S, dtype=jnp.int32)
    carry = (caches, next_tok, pos0, key)
    segs, p, left = [], S, max_new_tokens - 1
    while left > 0:
        w = attn_bucket(p + 1, cache_len)
        span = min(left, w - p) if w < cache_len else left
        carry, seg = jax.lax.scan(make_step(win_kw(p + span)), carry, None,
                                  length=span)
        segs.append(seg)
        p, left = p + span, left - span
    toks = (jnp.concatenate(segs, axis=0) if segs
            else jnp.zeros((0, B), jnp.int32))
    out = jnp.concatenate(
        [prompt_ids, next_tok[:, None], toks.T.astype(jnp.int32)], axis=1)
    return out


def generate_stream(cfg: ModelConfig, params: Dict[str, Any],
                    prompt_ids: jax.Array, max_new_tokens: int, *,
                    chunk: int = 8,
                    key: Optional[jax.Array] = None,
                    temperature: float = 0.0, top_k: int = 0,
                    cache_len: int = 2048, dtype_str: str = "bfloat16",
                    kv_quantized: bool = False):
    """Streaming decode: yields np.int32 arrays of shape (B, <=chunk) as
    tokens are produced (parity: the reference's callback streaming at
    ``example_generate.py:36-56``, which buffers 4 tokens per callback).

    Each chunk is one jitted lax.scan; chunks never cross an attention
    bucket boundary so every scan body reads a fixed static cache prefix.
    The per-(window, length) step functions are compiled once per call and
    reused across chunks."""
    dtype = np.dtype(dtype_str)
    B, S = prompt_ids.shape
    assert S + max_new_tokens <= cache_len, (
        f"prompt ({S}) + max_new_tokens ({max_new_tokens}) exceeds "
        f"cache_len ({cache_len}) — writes would silently clamp")
    if key is None:
        key = jax.random.PRNGKey(0)
    A = get_arch(cfg)
    import inspect
    windowed = "attn_window" in inspect.signature(A.model_apply).parameters

    def win_kw(need: int) -> dict:
        if not windowed:
            return {}
        return {"attn_window": attn_bucket(need, cache_len)}

    caches = init_kv_caches(cfg, B, cache_len, dtype,
                            quantized=kv_quantized)
    positions = jnp.arange(S)[None, :].repeat(B, 0)
    logits, caches = A.model_apply(
        cfg, params, prompt_ids, positions=positions, kv_caches=caches,
        cache_position=0, dtype=dtype, **win_kw(S))
    key, sub = jax.random.split(key)
    next_tok = sample_token(logits[:, -1, :].astype(jnp.float32), sub,
                            temperature, top_k)
    yield np.asarray(next_tok)[:, None]

    fns: dict = {}

    def chunk_fn(wkw_items: tuple, n: int):
        if (wkw_items, n) not in fns:
            wkw = dict(wkw_items)

            def run(params, caches, tok, pos, key):
                def step(carry, _):
                    caches, tok, pos, key = carry
                    key, sub = jax.random.split(key)
                    logits, caches = A.model_apply(
                        cfg, params, tok[:, None], positions=pos[:, None],
                        kv_caches=caches, cache_position=pos[0],
                        dtype=dtype, **wkw)
                    nxt = sample_token(
                        logits[:, -1, :].astype(jnp.float32), sub,
                        temperature, top_k)
                    return (caches, nxt, pos + 1, key), nxt
                (caches, tok, pos, key), toks = jax.lax.scan(
                    step, (caches, tok, pos, key), None, length=n)
                return caches, tok, pos, key, toks
            fns[(wkw_items, n)] = jax.jit(run, donate_argnums=(1,))
        return fns[(wkw_items, n)]

    pos = jnp.full((B,), S, dtype=jnp.int32)
    p, left = S, max_new_tokens - 1
    while left > 0:
        w = attn_bucket(p + 1, cache_len)
        seg = min(left, w - p) if w < cache_len else left
        n = min(chunk, seg)
        wkw = win_kw(p + n)
        fn = chunk_fn(tuple(sorted(wkw.items())), n)
        caches, next_tok, pos, key, toks = fn(params, caches, next_tok,
                                              pos, key)
        yield np.asarray(toks).T.astype(np.int32)
        p, left = p + n, left - n


def attn_bucket(need: int, cache_len: int) -> int:
    """Smallest decode-attention bucket (256 · 2^k, capped at cache_len)
    covering `need` cache slots — mirrors the runtime lax.switch ladder in
    models/llama.py attention."""
    w = 256
    while w < min(need, cache_len):
        w *= 2
    return min(w, cache_len)


def decode_step_fn(cfg: ModelConfig, cache_len: int = 2048,
                   dtype=jnp.bfloat16, linear_kw=None):
    """A jittable single-token decode step (for benchmarking the hot path in
    isolation): (params, caches, tok (B,), pos scalar) -> (logits, caches).
    ``linear_kw`` forwards to the QuantLinear layers (e.g.
    {"matmul_impl": "dequant"} to pin the decode implementation)."""
    A = get_arch(cfg)

    def step(params, caches, tok, pos):
        B = tok.shape[0]
        positions = jnp.broadcast_to(pos, (B,))[:, None]
        logits, caches = A.model_apply(
            cfg, params, tok[:, None], positions=positions,
            kv_caches=caches, cache_position=pos, dtype=dtype,
            linear_kw=linear_kw)
        return logits[:, -1, :], caches
    return step


def perplexity(cfg: ModelConfig, params: Dict[str, Any],
               token_windows: np.ndarray, batch_size: int = 1,
               dtype=jnp.float32, sp_mesh=None) -> float:
    """Sliding-window perplexity over (N, S) token windows — the eval the
    reference defers to the quip-sharp blog (README.md:18); first-class here
    because quality parity is a north-star metric (BASELINE.md).

    ``sp_mesh``: an ("sp",) mesh routes the forward through ring-attention
    sequence parallelism (parallel/sequence.py) — windows longer than one
    device's activation memory evaluate sharded, exactly."""
    A = get_arch(cfg)

    @jax.jit
    def nll(batch):
        if sp_mesh is not None:
            from ..parallel.sequence import sequence_parallel_logits
            logits = sequence_parallel_logits(cfg, params, batch, sp_mesh,
                                              dtype=dtype)
        else:
            logits, _ = A.model_apply(cfg, params, batch, dtype=dtype)
        logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32),
                                  axis=-1)
        tgt = batch[:, 1:]
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return -ll.mean()

    losses = []
    for i in range(0, token_windows.shape[0], batch_size):
        b = jnp.asarray(token_windows[i:i + batch_size])
        if b.shape[0] < batch_size:
            break
        losses.append(float(nll(b)))
    return float(np.exp(np.mean(losses)))
