"""Continuous-batching serving engine.

The reference has no serving layer at all (its README points users at a
custom vLLM fork, ``README.md:77-84``); here slot-based continuous batching
is first-class and TPU-shaped: a fixed-size batch of decode slots advances
in one jitted step (static shapes), and admission runs CHUNKED PREFILL —
every free slot with a pending request prefills together, prompts streamed
through one fixed-shape jitted step in ``prefill_chunk``-token chunks that
write straight into the big per-slot KV caches (vmapped per-row dynamic
updates, models/llama.py attention). Two compiled programs total (one
prefill shape, one decode shape), no per-admit cache copies, prompts of any
length up to ``cache_len``.

Slots that are mid-decode during an admission write their (ignored) pad
chunk into a ``prefill_chunk``-slot scratch region appended to the cache
(positions ``>= cache_len`` are never attended: the cache mask allows only
``j <= position`` and positions stay ``< cache_len``), so admission never
perturbs in-flight streams and the dynamic-slice start clamp can never
reach valid history.

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
from .generate import attn_bucket
from .generate import sample_token


@dataclasses.dataclass
class _Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    inflight: int = 0     # tokens enqueued on device, not yet fetched


class ServingEngine:
    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 max_batch: int = 8, cache_len: int = 2048,
                 dtype=jnp.bfloat16, temperature: float = 0.0,
                 top_k: int = 0, prefill_buckets=None,
                 prefill_chunk: Optional[int] = None,
                 decode_chunk: int = 8,
                 seed: int = 0, mesh=None,
                 on_token=None, kv_quantized: bool = False,
                 pipeline_depth: int = 2, fetch_batch: int = 4):
        """``on_token(rid, token, done)`` — optional streaming callback,
        invoked in emission order for every generated token (including the
        first, sampled at admission) with ``done=True`` on a request's
        final token. The reference stack streams via TextStreamer in its
        generate example only (example_generate.py:89-101); the serving
        engine here makes it first-class."""
        self.cfg = cfg
        self.mesh = mesh
        self.on_token = on_token
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
        if prefill_chunk is None:
            # legacy prefill_buckets kwarg: smallest bucket was the unit of
            # prefill work, so it maps onto the chunk size
            prefill_chunk = (min(prefill_buckets) if prefill_buckets
                             else min(128, cache_len))
        self.C = min(int(prefill_chunk), cache_len)
        self.decode_chunk = max(1, int(decode_chunk))
        KV, hd = cfg.num_key_value_heads, cfg.head_dim

        def _put(z):
            if mesh is not None:
                # caches shard on kv heads only (slots stay addressable)
                from jax.sharding import NamedSharding, PartitionSpec as P
                z = jax.device_put(z, NamedSharding(
                    mesh, P(None, None, "tp" if KV % mesh.shape["tp"] == 0
                            else None, None)))
            return z

        def _kv(shape):
            if kv_quantized:
                # int8 codes + per-position scales: half the attention HBM
                # reads and cache memory (models/common.py QuantKVCache)
                from ..models.common import QuantKVCache
                return QuantKVCache(
                    _put(jnp.zeros(shape, jnp.int8)),
                    _put(jnp.zeros((*shape[:3], 1), jnp.float32)))
            return _put(jnp.zeros(shape, dtype))

        # + C scratch slots at the tail: idle rows park their pad chunks at
        # position S during admissions (never attended, never clamped back
        # into valid history)
        self.caches = [
            (_kv((max_batch, cache_len + self.C, KV, hd)),
             _kv((max_batch, cache_len + self.C, KV, hd)))
            for _ in range(cfg.num_hidden_layers)
        ]
        self.pos = np.zeros(max_batch, dtype=np.int32)       # next write pos
        self.last_tok = np.zeros(max_batch, dtype=np.int32)
        self.active = np.zeros(max_batch, dtype=bool)
        # decode pipelining (round 5): the last sampled token stays a
        # DEVICE array between chunks, so the next chunk enqueues with no
        # host roundtrip; fetched token chunks queue in _inflight and are
        # processed `pipeline_depth` chunks behind. Over the remote-TPU
        # relay this removes a ~35-40 ms sync from every chunk (measured
        # r4: bs=1 chunk=1 serving ran at 24.6 tok/s vs ~150 model speed,
        # inter_chunk_ms_p50 = 39.2 — pure tunnel latency).
        self.pipeline_depth = max(0, int(pipeline_depth))
        self._tok_dev = None                     # device (B,) last tokens
        # device mirrors of pos / active / key (round 5, measured on
        # hardware 12:41: chunk=8 serving paid ~30 ms/chunk re-uploading
        # pos/active/key — three small h2d transfers, each a relay
        # round-trip). The decode program advances pos and key itself and
        # returns them; between admissions the host enqueues chunks with
        # ZERO h2d transfers. Invalidated (None) at every admission —
        # the only point where host state the device can't derive
        # (new slots) changes. Finished slots do NOT invalidate: the
        # device keeps speculating on the stale-active snapshot (surplus
        # tokens are discarded at drain), and the host advances self.pos
        # with the same snapshot, so host and device pos stay equal.
        self._pos_dev = None
        self._key_dev = None
        self._act_dev = None
        self._act_snap = None                    # host copy of _act_dev
        self._inflight: List[tuple] = []         # (toks_dev, n, active)
        # fetch batching (round 5): each device->host token fetch costs a
        # full relay round-trip (~40 ms measured 12:56) REGARDLESS of
        # payload, so draining one chunk per step rate-limits serving to
        # one RTT per chunk. `fetch_batch` pending chunks are instead
        # concatenated ON DEVICE (a cheap async dispatch) and fetched in
        # ONE round-trip — hardware A/B 12:56: bs=1 chunk=8 went 71 ->
        # 97 tok/s with mirrors alone; batching the fetches amortizes the
        # remaining RTT across fetch_batch chunks. Tokens then surface in
        # bursts of up to fetch_batch*chunk; set fetch_batch=1 for
        # lowest-latency streaming (the bs=1 chunk=1 latency row).
        self.fetch_batch = max(1, int(fetch_batch))
        # `pos` advances at ENQUEUE time (it parameterizes the device
        # step); `proc_pos` advances as fetched tokens are processed and
        # drives the finish conditions
        self.proc_pos = np.zeros(max_batch, dtype=np.int32)
        self.slot_req: List[Optional[_Request]] = [None] * max_batch
        self.pending: List[_Request] = []
        self.done: Dict[int, np.ndarray] = {}
        self._next_rid = 0
        self.key = jax.random.PRNGKey(seed)

        self._decode = jax.jit(self._decode_impl, donate_argnums=(0,),
                               static_argnames=("attn_window", "chunk"))
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(0,),
                                static_argnames=("attn_window",))

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
        while (self.pending or self.active.any()
               or self._inflight) and steps < max_steps:
            self.step()
            steps += 1
        return dict(self.done)

    # ------------------------------------------------------------ internals

    def _prefill_impl(self, caches, params, toks, pos, take,
                      attn_window=None):
        """One chunk of batched prefill, written in place at each row's
        position. toks (B, C); pos (B,) chunk-start write positions (rows
        not prefilling park at S, the scratch region); take (B,) in-chunk
        index of each row's last prompt token (0 when not in this chunk).
        attn_window (static): every PREFILLING row's query positions are
        < attn_window, so attention reads only that cache prefix (parked
        rows' outputs are discarded). Returns (caches, per-row logits at
        `take`)."""
        C = toks.shape[1]
        positions = pos[:, None] + jnp.arange(C)[None, :]
        logits, caches = get_arch(self.cfg).model_apply(
            self.cfg, params, toks, positions=positions,
            kv_caches=caches, cache_position=pos, dtype=self.dtype,
            attn_window=attn_window)
        last = jnp.take_along_axis(
            logits, take[:, None, None].astype(jnp.int32), axis=1)[:, 0, :]
        return caches, last.astype(jnp.float32)

    def _decode_impl(self, caches, params, tok, pos, active, key,
                     attn_window=None, chunk=1):
        """`chunk` (static) decode steps in ONE device program — the
        scheduler only intervenes (admit/evict) at chunk boundaries, the
        standard iteration-granularity tradeoff; over the remote-TPU relay
        this also amortizes the ~32 ms per-call dispatch. Returns the
        (chunk, B) token matrix; finished slots' surplus tokens are
        discarded by the host."""
        A = get_arch(self.cfg)

        def step(carry, _):
            caches, tok, pos, key = carry
            key, sub = jax.random.split(key)
            logits, caches = A.model_apply(
                self.cfg, params, tok[:, None], positions=pos[:, None],
                kv_caches=caches, cache_position=pos, dtype=self.dtype,
                attn_window=attn_window)
            nxt = sample_token(logits[:, -1, :].astype(jnp.float32), sub,
                               self.temperature, self.top_k)
            nxt = jnp.where(active, nxt, tok)
            return (caches, nxt, pos + active.astype(pos.dtype), key), nxt
        (caches, _, pos, key), toks = jax.lax.scan(
            step, (caches, tok, pos, key), None, length=chunk)
        # pos/key return so the host can keep them device-resident
        # between chunks (mirror pipelining; see __init__)
        return caches, toks, pos, key

    def _admit(self):
        admits: List[_Request] = []
        for slot in range(self.B):
            if self.active[slot] or not self.pending:
                continue
            req = self.pending.pop(0)
            n = req.prompt.shape[0]
            if n > self.S - 1:
                raise ValueError(f"prompt length {n} exceeds cache {self.S}")
            req.slot = slot
            admits.append(req)
        if not admits:
            return
        # all admitted prompts stream through the one fixed-shape chunk
        # step together; rows without a segment this chunk (mid-decode
        # slots, shorter prompts already consumed) park at scratch pos S
        C = self.C
        n_chunks = max((r.prompt.shape[0] + C - 1) // C for r in admits)
        last_logits: Dict[int, np.ndarray] = {}
        for c in range(n_chunks):
            start = c * C
            toks = np.zeros((self.B, C), dtype=np.int32)
            posv = np.full(self.B, self.S, dtype=np.int32)
            take = np.zeros(self.B, dtype=np.int32)
            finals = []
            for req in admits:
                seg = req.prompt[start:start + C]
                if seg.shape[0] == 0:
                    continue
                toks[req.slot, :seg.shape[0]] = seg
                posv[req.slot] = start
                if start + seg.shape[0] == req.prompt.shape[0]:
                    take[req.slot] = seg.shape[0] - 1
                    finals.append(req.slot)
            w = attn_bucket(
                min(self.S, max(start + C for r in admits
                                if r.prompt.shape[0] > start)), self.S)
            self.caches, last = self._prefill(
                self.caches, self.params, jnp.asarray(toks),
                jnp.asarray(posv), jnp.asarray(take), attn_window=w)
            if finals:
                last = np.asarray(last)
                for slot in finals:
                    last_logits[slot] = last[slot]
        for req in admits:
            slot = req.slot
            self.key, sub = jax.random.split(self.key)
            first = np.asarray(sample_token(last_logits[slot][None, :], sub,
                                            self.temperature, self.top_k))
            self.slot_req[slot] = req
            self.active[slot] = True
            self.pos[slot] = req.prompt.shape[0]
            self.proc_pos[slot] = req.prompt.shape[0]
            # host state is authoritative again: drop all device mirrors
            self._tok_dev = None
            self._pos_dev = self._key_dev = None
            self._act_dev = self._act_snap = None
            self.last_tok[slot] = int(first[0])
            req.generated.append(int(first[0]))
            done = (req.max_new_tokens <= 1
                    or self.pos[slot] >= self.S - 1)
            if self.on_token is not None:
                self.on_token(req.rid, int(first[0]), done)
            if done:
                self.done[req.rid] = np.concatenate(
                    [req.prompt,
                     np.asarray(req.generated, dtype=np.int32)])
                self.active[slot] = False
                self.slot_req[slot] = None

    def _drain_batch(self, k: int):
        """Fetch + process the ``k`` oldest in-flight token chunks in ONE
        device->host round-trip (device-side concat; see fetch_batch)."""
        k = min(k, len(self._inflight))
        entries = self._inflight[:k]
        del self._inflight[:k]
        if k == 1:
            toks = np.asarray(entries[0][0])
        else:
            toks = np.asarray(jnp.concatenate(
                [e[0] for e in entries], axis=0))     # one host sync
        emitted = []
        off = 0
        for _, n, act in entries:
            emitted += self._process_tokens(toks[off:off + n], n, act)
            off += n
        return emitted

    def _drain_one(self):
        return self._drain_batch(1)

    def _process_tokens(self, toks, n, act):
        """Apply one fetched (n, B) token chunk to scheduler state."""
        emitted = []
        for t in range(n):
            nxt = toks[t]
            for slot in range(self.B):
                if not act[slot]:
                    continue
                req = self.slot_req[slot]
                if req is None or not self.active[slot]:
                    continue      # finished in an earlier chunk/step
                req.inflight -= 1
                if len(req.generated) >= req.max_new_tokens:
                    continue      # surplus speculative tokens: discard
                req.generated.append(int(nxt[slot]))
                emitted.append((req.rid, int(nxt[slot])))
                self.proc_pos[slot] += 1
                self.last_tok[slot] = nxt[slot]
                finished = (len(req.generated) >= req.max_new_tokens
                            or self.proc_pos[slot] >= self.S - 1)
                if self.on_token is not None:
                    self.on_token(req.rid, int(nxt[slot]), finished)
                if finished:
                    self.done[req.rid] = np.concatenate(
                        [req.prompt, np.asarray(req.generated,
                                                dtype=np.int32)])
                    self.active[slot] = False
                    self.slot_req[slot] = None
        return emitted

    def _drain_all(self):
        if not self._inflight:
            return []
        return self._drain_batch(len(self._inflight))

    def step(self):
        emitted = []
        if self.pending and self._inflight:
            # admission rewrites slot state: fully sync first
            emitted += self._drain_all()
        self._admit()
        if not self.active.any():
            return emitted + self._drain_all()
        # largest remaining token budget among active slots, net of
        # already-enqueued (in-flight) steps — when every request's
        # remaining tokens are already on the device, just drain
        remaining = max(
            req.max_new_tokens - len(req.generated) - req.inflight
            for req in self.slot_req if req is not None)
        if remaining <= 0:
            return emitted + (self._drain_batch(self.fetch_batch)
                              if self._inflight else [])
        max_pos = int(self.pos[self.active].max())
        # clamp the chunk to `remaining`, rounded up to a power of two so
        # tail chunks reuse <= log2(decode_chunk) compiled programs
        # instead of one per distinct tail length (chunk is a static
        # arg); waste stays < 2x the needed tail
        needed = max(1, min(self.decode_chunk, remaining))
        n = 1
        while n < needed:
            n *= 2
        n = max(1, min(n, self.decode_chunk, self.S - 1 - max_pos))
        w = attn_bucket(max_pos + n, self.S)
        tok_in = (self._tok_dev if self._tok_dev is not None
                  else jnp.asarray(self.last_tok))
        if self._pos_dev is not None:
            pos_in, key_in = self._pos_dev, self._key_dev
            act_in, act = self._act_dev, self._act_snap
        else:
            self.key, key_in = jax.random.split(self.key)
            pos_in = jnp.asarray(self.pos)
            act = self.active.copy()
            act_in = jnp.asarray(act)
        self.caches, toks, self._pos_dev, self._key_dev = self._decode(
            self.caches, self.params, tok_in,
            pos_in, act_in, key_in,
            attn_window=w, chunk=n)
        self._act_dev, self._act_snap = act_in, act
        self._tok_dev = toks[-1]                     # stays on device
        for slot in range(self.B):
            if act[slot]:
                req = self.slot_req[slot]
                if req is not None:      # finished slot still in the
                    req.inflight += n    # stale device snapshot: its
                self.pos[slot] += n      # surplus tokens drain discarded
        self._inflight.append((toks, n, act))
        while (len(self._inflight)
               >= self.pipeline_depth + self.fetch_batch):
            emitted += self._drain_batch(self.fetch_batch)
        return emitted
