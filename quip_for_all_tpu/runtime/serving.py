"""Continuous-batching serving engine.

The reference has no serving layer at all (its README points users at a
custom vLLM fork, ``README.md:77-84``); here slot-based continuous batching
is first-class and TPU-shaped: a fixed-size batch of decode slots advances
in one jitted step (static shapes), finished slots are refilled by
prefilling new requests into bucketed prompt lengths, and per-slot KV-cache
write positions use vmapped dynamic updates (models/llama.py attention).

    engine = ServingEngine(cfg, params, max_batch=8, cache_len=2048)
    rid = engine.add_request(prompt_ids, max_new_tokens=64)
    results = engine.run()          # {rid: np.ndarray tokens}
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as M
from ..models.config import ModelConfig
from ..models.registry import get_arch
from .generate import sample_token


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None


class ServingEngine:
    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 max_batch: int = 8, cache_len: int = 2048,
                 dtype=jnp.bfloat16, temperature: float = 0.0,
                 top_k: int = 0, prefill_buckets=(32, 128, 512, 2048),
                 seed: int = 0, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # tensor-sharded serving: weights (incl. quantized planes) get
            # megatron specs, KV caches shard over kv heads
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import kv_cache_specs, shard_params
            params = shard_params(cfg, params, mesh)
            self._kv_sh = NamedSharding(
                mesh, kv_cache_specs(mesh, cfg.num_key_value_heads))
        self.params = params
        self.B, self.S = max_batch, cache_len
        self.dtype = dtype
        self.temperature, self.top_k = temperature, top_k
        self.buckets = [b for b in prefill_buckets if b <= cache_len]
        KV, hd = cfg.num_key_value_heads, cfg.head_dim

        def _kv(shape):
            z = jnp.zeros(shape, dtype)
            if mesh is not None:
                # caches shard on kv heads only (slots stay addressable)
                from jax.sharding import NamedSharding, PartitionSpec as P
                z = jax.device_put(z, NamedSharding(
                    mesh, P(None, None, "tp" if KV % mesh.shape["tp"] == 0
                            else None, None)))
            return z

        self.caches = [
            (_kv((max_batch, cache_len, KV, hd)),
             _kv((max_batch, cache_len, KV, hd)))
            for _ in range(cfg.num_hidden_layers)
        ]
        self.pos = np.zeros(max_batch, dtype=np.int32)       # next write pos
        self.last_tok = np.zeros(max_batch, dtype=np.int32)
        self.active = np.zeros(max_batch, dtype=bool)
        self.slot_req: List[Optional[_Request]] = [None] * max_batch
        self.pending: List[_Request] = []
        self.done: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        self.key = jax.random.PRNGKey(seed)

        self._decode = jax.jit(self._decode_impl, donate_argnums=(0,))
        self._prefill = {}

    # ------------------------------------------------------------ public

    def add_request(self, prompt_ids: np.ndarray,
                    max_new_tokens: int = 64) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.pending.append(_Request(rid, np.asarray(prompt_ids,
                                                     dtype=np.int32),
                                     max_new_tokens))
        return rid

    def run(self, max_steps: int = 100000) -> Dict[int, np.ndarray]:
        steps = 0
        while (self.pending or self.active.any()) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self.done)

    # ------------------------------------------------------------ internals

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds cache {self.S}")

    def _prefill_fn(self, bucket: int):
        if bucket in self._prefill:
            return self._prefill[bucket]

        @jax.jit
        def fn(params, caches, ids, true_len):
            # single-sequence prefill (batch 1), cache slot 0
            S = ids.shape[1]
            positions = jnp.arange(S)[None, :]
            logits, caches = get_arch(self.cfg).model_apply(
                self.cfg, params, ids, positions=positions,
                kv_caches=caches, cache_position=0, dtype=self.dtype)
            last = logits[0, true_len - 1, :]
            return caches, last

        self._prefill[bucket] = fn
        return fn

    def _decode_impl(self, caches, params, tok, pos, active, key):
        positions = pos[:, None]
        logits, caches = get_arch(self.cfg).model_apply(
            self.cfg, params, tok[:, None], positions=positions,
            kv_caches=caches, cache_position=pos, dtype=self.dtype)
        nxt = sample_token(logits[:, -1, :].astype(jnp.float32), key,
                           self.temperature, self.top_k)
        nxt = jnp.where(active, nxt, tok)
        return caches, nxt

    def _admit(self):
        for slot in range(self.B):
            if self.active[slot] or not self.pending:
                continue
            req = self.pending.pop(0)
            req.slot = slot
            n = req.prompt.shape[0]
            bucket = self._bucket(n)
            ids = np.zeros((1, bucket), dtype=np.int32)
            ids[0, :n] = req.prompt
            KV, hd = self.cfg.num_key_value_heads, self.cfg.head_dim
            tmp = [(jnp.zeros((1, self.S, KV, hd), self.dtype),
                    jnp.zeros((1, self.S, KV, hd), self.dtype))
                   for _ in range(self.cfg.num_hidden_layers)]
            tmp, last_logits = self._prefill_fn(bucket)(
                self.params, tmp, jnp.asarray(ids), n)
            # copy the prefilled rows into the big caches at `slot`
            new_caches = []
            for (ck, cv), (tk, tv) in zip(self.caches, tmp):
                ck = ck.at[slot].set(tk[0])
                cv = cv.at[slot].set(tv[0])
                new_caches.append((ck, cv))
            self.caches = new_caches
            self.key, sub = jax.random.split(self.key)
            first = np.asarray(sample_token(last_logits[None, :], sub,
                                            self.temperature, self.top_k))
            self.slot_req[slot] = req
            self.active[slot] = True
            self.pos[slot] = n
            self.last_tok[slot] = int(first[0])
            req.generated.append(int(first[0]))

    def step(self):
        self._admit()
        if not self.active.any():
            return []
        self.key, sub = jax.random.split(self.key)
        self.caches, nxt = self._decode(
            self.caches, self.params, jnp.asarray(self.last_tok),
            jnp.asarray(self.pos), jnp.asarray(self.active), sub)
        nxt = np.asarray(nxt)
        emitted = []
        for slot in range(self.B):
            if not self.active[slot]:
                continue
            req = self.slot_req[slot]
            req.generated.append(int(nxt[slot]))
            emitted.append((req.rid, int(nxt[slot])))
            self.pos[slot] += 1
            self.last_tok[slot] = nxt[slot]
            if (len(req.generated) >= req.max_new_tokens
                    or self.pos[slot] >= self.S - 1):
                self.done[req.rid] = np.concatenate(
                    [req.prompt, np.asarray(req.generated,
                                            dtype=np.int32)])
                self.active[slot] = False
                self.slot_req[slot] = None
        return emitted
