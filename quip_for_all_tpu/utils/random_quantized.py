"""Build a quantized model with random codes — for benchmarks and compile
checks in environments without downloadable checkpoints (zero egress).
Shapes, dtypes, and compute paths are identical to a really-quantized model;
only the code values are random.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook, get_codebook
from ..models import llama as M
from ..models.config import ModelConfig
from ..nn.qlinear import QuantLinearParams
from ..ops.qtensor import from_raw_idxs
from ..transforms.incoherence import get_hadK


def _n_codes(cb: Codebook) -> int:
    return {"D4": 256, "E8P12": 1 << 16, "HI": 16,
            "E8P12RVQ3B": 1 << 24, "E8P12RVQ4B": 1 << 32}[cb.id]


def random_qlinear(cb: Codebook, in_f: int, out_f: int,
                   rng: np.random.Generator, use_rand: bool = True,
                   bias: bool = False, dtype=jnp.bfloat16,
                   lspec=None, SU=None) -> QuantLinearParams:
    if lspec is None:
        lspec = get_hadK(in_f, use_rand=use_rand, rng=rng)
    rspec = get_hadK(out_f, use_rand=use_rand, rng=rng)
    qt = _random_qtensor(cb, rspec.padN, lspec.padN, rng)
    if SU is None:
        SU = np.sign(rng.standard_normal(in_f)).astype(np.float32)
    return QuantLinearParams(
        qweight=qt, Wscale=None,
        SU=jnp.asarray(SU, dtype=dtype),
        SV=jnp.asarray(np.sign(rng.standard_normal(out_f)).astype(np.float32),
                       dtype=dtype),
        bias=jnp.zeros((out_f,), dtype) if bias else None,
        had_left=None if lspec.hadK is None else jnp.asarray(lspec.hadK,
                                                             dtype=dtype),
        had_right=None if rspec.hadK is None else jnp.asarray(rspec.hadK,
                                                              dtype=dtype),
        in_features=in_f, out_features=out_f,
        K_left=lspec.K, K_right=rspec.K,
        q_in=lspec.padN, q_out=rspec.padN,
        per_channel=False,
        wscale_float=float(1.0 / np.sqrt(in_f)))


def random_plane_shapes(cb_id: str, layout: str, q_out: int, q_in: int
                        ) -> Dict[str, tuple]:
    """Plane-array shapes for the runtime layouts the random builders can
    generate natively (full-random bits are valid planes for u3/pb: every
    bit is an independent field)."""
    from ..ops.qtensor import pb_parity_lanes, u3_parity_lanes
    G = q_in // 8
    if layout == "u3":
        Gp = -(-G // 256) * 256
        return {"w0": (q_out // 2, Gp), "w1": (q_out // 2, Gp // 2),
                "w2": (q_out // 2, u3_parity_lanes(Gp))}
    if layout == "pb":
        Gp = -(-G // 128) * 128
        return {"w0": (2, q_out // 2, Gp), "w1": (q_out // 2, Gp),
                "w2": (q_out // 2, pb_parity_lanes(Gp))}
    Gp = -(-G // 128) * 128
    nplanes = {"E8P12": 1, "D4": 1, "HI": 1,
               "E8P12RVQ3B": 2, "E8P12RVQ4B": 2}[cb_id]
    return {f"w{i}": (q_out, Gp) for i in range(nplanes)}


def _random_qtensor(cb: Codebook, q_out: int, q_in: int,
                    rng: np.random.Generator):
    """Random-but-valid runtime word planes, generated ON DEVICE (a 7B
    model's planes would take minutes to push through the host link)."""
    import jax

    from ..ops.qtensor import (QuantizedTensor, e8p_u3_default,
                               rvq_pb_default)
    G = q_in // 8
    Gp = -(-G // 128) * 128
    def rand_words(mask, extra=0):
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
        r = jax.random.bits(key, (q_out, Gp), jnp.uint32)
        w = (r & jnp.uint32(mask)) | (r & jnp.uint32(extra))
        return jax.lax.bitcast_convert_type(w, jnp.int32)
    # E8P word: keep each 3-bit field in {0..3} (valid subset of {0..5}),
    # random parity bit
    e8p_mask, e8p_par = np.uint32(0x6DB6DB), np.uint32(0x1000000)
    layout = None
    if cb.id == "E8P12" and e8p_u3_default() and q_out % 2 == 0:
        layout = "u3"
    elif cb.id == "E8P12RVQ4B" and rvq_pb_default() and q_out % 2 == 0:
        layout = "pb"
    if layout is not None:
        planes = {}
        for pname, shape in random_plane_shapes(cb.id, layout,
                                                q_out, q_in).items():
            key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
            planes[pname] = jax.lax.bitcast_convert_type(
                jax.random.bits(key, shape, jnp.uint32), jnp.int32)
        ors = getattr(cb, "opt_resid_scale", -1.0)
        return QuantizedTensor(planes, cb.id, q_out, q_in, float(ors),
                               layout=layout)
    if cb.id == "E8P12":
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par))}
    elif cb.id == "E8P12RVQ4B":
        from ..ops.qtensor import paired_wp, rvq_paired_default
        if rvq_paired_default():
            # paired ~6.5-bit layout (ops/qtensor.py): u0 in {0..3},
            # random u1-low bit per nibble; u1-high fields in {0,1};
            # random parity pairs
            Gpp = -(-G // 256) * 256
            def rw(cols, mask):
                key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
                r = jax.random.bits(key, (q_out, cols), jnp.uint32)
                return jax.lax.bitcast_convert_type(
                    r & jnp.uint32(mask), jnp.int32)
            planes = {"w0": rw(Gpp, 0xBBBBBBBB),
                      "w1": rw(Gpp // 2, 0x55555555),
                      "w2": rw(paired_wp(Gpp), 0xFFFFFFFF)}
            ors = getattr(cb, "opt_resid_scale", -1.0)
            return QuantizedTensor(planes, cb.id, q_out, q_in, float(ors),
                                   layout="paired")
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par)),
                  "w1": jnp.asarray(rand_words(e8p_mask, e8p_par))}
    elif cb.id == "E8P12RVQ3B":
        planes = {"w0": jnp.asarray(rand_words(e8p_mask, e8p_par)),
                  "w1": jnp.asarray(rand_words(np.uint32(0xFFFFFFFF)))}
    elif cb.id in ("D4", "HI"):
        planes = {"w0": jnp.asarray(rand_words(np.uint32(0xFFFFFFFF)))}
    else:
        raise ValueError(cb.id)
    ors = getattr(cb, "opt_resid_scale", -1.0)
    qt = QuantizedTensor(planes, cb.id, q_out, q_in, float(ors))
    from ..ops.qtensor import (bfp_default, subword_split_default, to_bfp,
                               to_subword)
    if subword_split_default() > 1:
        qt = to_subword(qt, subword_split_default())
    elif bfp_default() and q_out % 2 == 0:
        qt = to_bfp(qt)
    return qt


def _fast_random_llama(cfg: ModelConfig, cb: Codebook, seed: int,
                       use_rand: bool, dtype, quantize_head: bool
                       ) -> Dict[str, Any]:
    """Fast-path builder for llama-family configs: EVERY device array comes
    out of ONE jitted program (planes, SU/SV signs, embeds, norms), with
    only the non-pow2 hadK factors transferred from host (stacked, one
    transfer per role). Motivation: the naive per-layer builder issued
    ~2000 tiny device programs/transfers, which over the remote-TPU relay
    cost 135-550s per bench attempt (r3/r4 logs) — a deliverability
    hazard when one wedge already burns most of the bench budget."""
    import functools

    import jax

    from ..ops.qtensor import (QuantizedTensor, bfp_default,
                               subword_split_default)
    if cb.id not in ("E8P12", "E8P12RVQ4B", "E8P12RVQ3B", "D4", "HI"):
        raise NotImplementedError(cb.id)
    if subword_split_default() > 1:
        raise NotImplementedError("sw layouts use the per-layer builder")
    from ..ops.qtensor import rvq_paired_default
    if cb.id == "E8P12RVQ4B" and rvq_paired_default():
        raise NotImplementedError("paired layout uses the per-layer builder")
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    Hh, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    Dq, Dkv = Hh * hd, KV * hd
    L = cfg.num_hidden_layers
    V = cfg.vocab_size
    head_q = quantize_head and not cfg.tie_word_embeddings and V % 128 == 0

    # (in_f, out_f) per quantized role; q/k/v share left spec+SU, gate/up
    # share left spec+SU (the quantizer's share_group_transforms guarantee
    # that fuse_for_inference relies on)
    roles = [("q", D, Dq, "qkv"), ("k", D, Dkv, "qkv"),
             ("v", D, Dkv, "qkv"), ("o", Dq, D, "o"),
             ("gate", D, I, "mlp"), ("up", D, I, "mlp"),
             ("down", I, D, "down")]
    if head_q:
        roles.append(("head", D, V, "head"))

    # host: per-layer HadSpecs (random-orthogonal hadK factors via QR);
    # drawn in a fixed order so the build is seed-deterministic
    lspecs: Dict[str, list] = {}
    rspecs: Dict[str, list] = {}
    n_l = 1 if head_q else 0
    for share in ("qkv", "o", "mlp", "down"):
        in_f = {"qkv": D, "o": Dq, "mlp": D, "down": I}[share]
        lspecs[share] = [get_hadK(in_f, use_rand=use_rand, rng=rng)
                         for _ in range(L)]
    for name, in_f, out_f, share in roles:
        n = L if name != "head" else 1
        rspecs[name] = [get_hadK(out_f, use_rand=use_rand, rng=rng)
                        for _ in range(n)]
    if head_q:
        lspecs["head"] = [get_hadK(D, use_rand=use_rand, rng=rng)]

    def stack_hadk(specs):
        if specs[0].hadK is None:
            return None
        return jnp.asarray(np.stack([s.hadK for s in specs]), dtype=dtype)

    had_l = {s: stack_hadk(v) for s, v in lspecs.items()}
    had_r = {n: stack_hadk(v) for n, v in rspecs.items()}

    e8p_mask, e8p_par = np.uint32(0x6DB6DB), np.uint32(0x1000000)

    from ..ops.qtensor import e8p_u3_default, rvq_pb_default
    layout = "nibble"
    if cb.id == "E8P12" and e8p_u3_default():
        layout = "u3"
    elif cb.id == "E8P12RVQ4B" and rvq_pb_default():
        layout = "pb"

    def plane_masks():
        if layout in ("u3", "pb"):
            # every bit is an independent field: full-random is valid
            full = (np.uint32(0xFFFFFFFF), np.uint32(0))
            return {"w0": full, "w1": full, "w2": full}
        if cb.id == "E8P12":
            return {"w0": (e8p_mask, e8p_par)}
        if cb.id == "E8P12RVQ4B":
            return {"w0": (e8p_mask, e8p_par), "w1": (e8p_mask, e8p_par)}
        if cb.id == "E8P12RVQ3B":
            return {"w0": (e8p_mask, e8p_par),
                    "w1": (np.uint32(0xFFFFFFFF), np.uint32(0))}
        return {"w0": (np.uint32(0xFFFFFFFF), np.uint32(0))}

    masks = plane_masks()

    def build(key):
        """The one device program: all planes, signs, embeds, norms —
        sliced per layer INSIDE the program, so the host issues exactly one
        dispatch however many layers there are."""
        out: Dict[str, Any] = {}
        kroles = jax.random.split(key, len(roles) + 4)
        for (name, in_f, out_f, share), kr in zip(roles, kroles):
            n = L if name != "head" else 1
            q_in = lspecs[share][0].padN
            q_out = rspecs[name][0].padN
            shapes = random_plane_shapes(cb.id, layout, q_out, q_in)
            planes = {}
            for j, (pname, (mask, extra)) in enumerate(sorted(
                    masks.items())):
                r = jax.random.bits(jax.random.fold_in(kr, j),
                                    (n,) + shapes[pname], jnp.uint32)
                w = (r & mask) | (r & extra)
                planes[pname] = jax.lax.bitcast_convert_type(w, jnp.int32)
            sv = jnp.sign(jax.random.normal(
                jax.random.fold_in(kr, 17), (n, out_f))).astype(dtype)
            out[name] = [{"planes": {k: v[i] for k, v in planes.items()},
                          "SV": sv[i]} for i in range(n)]
        ksu, kemb, khead, knorm = kroles[len(roles):]
        for j, share in enumerate(("qkv", "o", "mlp", "down")):
            in_f = {"qkv": D, "o": Dq, "mlp": D, "down": I}[share]
            su = jnp.sign(jax.random.normal(
                jax.random.fold_in(ksu, j), (L, in_f))).astype(dtype)
            out[f"SU_{share}"] = [su[i] for i in range(L)]
        if head_q:
            out["SU_head"] = [jnp.sign(jax.random.normal(
                jax.random.fold_in(ksu, 9), (D,))).astype(dtype)]
        out["embed"] = (jax.random.normal(kemb, (V, D), dtype) * 0.02)
        if not cfg.tie_word_embeddings and not head_q:
            out["head_w"] = (jax.random.normal(khead, (V, D), dtype) * 0.02)
        out["ones_D"] = jnp.ones((D,), dtype)
        return out

    t = jax.jit(build)(jax.random.PRNGKey(seed))

    ors = float(getattr(cb, "opt_resid_scale", -1.0))
    want_bfp = bfp_default()

    # hadK per-layer slices, memoized so q/k/v (and gate/up) receive the
    # SAME array object — fuse_for_inference's sharable() check then
    # short-circuits on identity instead of fetching device buffers
    _hl_cache: Dict[tuple, Any] = {}

    def hl(share, li):
        if had_l[share] is None:
            return None
        return _hl_cache.setdefault(("l", share, li), had_l[share][li])

    def hr(name, li):
        if had_r[name] is None:
            return None
        return _hl_cache.setdefault(("r", name, li), had_r[name][li])

    def mk_param(name, in_f, out_f, share, SU_arr, li):
        lspec = lspecs[share][li]
        rspec = rspecs[name][li]
        qt = QuantizedTensor(dict(t[name][li]["planes"]), cb.id,
                             rspec.padN, lspec.padN, ors, layout=layout)
        if layout == "nibble" and want_bfp and qt.q_out % 2 == 0:
            from ..ops.qtensor import to_bfp
            qt = to_bfp(qt)
        return QuantLinearParams(
            qweight=qt, Wscale=None, SU=SU_arr,
            SV=t[name][li]["SV"],
            bias=None,
            had_left=hl(share, li), had_right=hr(name, li),
            in_features=in_f, out_features=out_f,
            K_left=lspec.K, K_right=rspec.K,
            q_in=lspec.padN, q_out=rspec.padN,
            per_channel=False,
            wscale_float=float(1.0 / np.sqrt(in_f)))

    ones_D = t["ones_D"]
    layers = []
    for li in range(L):
        su_qkv = t["SU_qkv"][li]
        su_mlp = t["SU_mlp"][li]
        blk = {
            "input_layernorm": {"weight": ones_D},
            "post_attention_layernorm": {"weight": ones_D},
            "self_attn": {
                "q_proj": mk_param("q", D, Dq, "qkv", su_qkv, li),
                "k_proj": mk_param("k", D, Dkv, "qkv", su_qkv, li),
                "v_proj": mk_param("v", D, Dkv, "qkv", su_qkv, li),
                "o_proj": mk_param("o", Dq, D, "o", t["SU_o"][li], li),
            },
            "mlp": {
                "gate_proj": mk_param("gate", D, I, "mlp", su_mlp, li),
                "up_proj": mk_param("up", D, I, "mlp", su_mlp, li),
                "down_proj": mk_param("down", I, D, "down",
                                      t["SU_down"][li], li),
            },
        }
        layers.append(blk)
    params = {
        "embed_tokens": {"weight": t["embed"]},
        "layers": layers,
        "norm": {"weight": ones_D},
    }
    if not cfg.tie_word_embeddings:
        if head_q:
            params["lm_head"] = mk_param("head", D, V, "head",
                                         t["SU_head"][0], 0)
        else:
            params["lm_head"] = {"weight": t["head_w"], "bias": None}
    return params


def random_quantized_model(cfg: ModelConfig, codebook: str = "E8P12",
                           seed: int = 0, use_rand: bool = True,
                           dtype=jnp.bfloat16,
                           quantize_experts: bool = True,
                           quantize_head: bool = False) -> Dict[str, Any]:
    """Full model params with every block linear quantized (gates and
    embeddings stay dense, matching modules_to_not_convert defaults).
    quantize_head also replaces lm_head — measured a ~0.2 ms/token win at
    llama-7B shapes (traced 2026-08-17; an earlier 5x-regression reading
    was an artifact of a degraded relay worker).

    Llama-family configs build through ``_fast_random_llama`` (one jitted
    device program instead of ~2000 tiny dispatches — the remote-relay
    deliverability fix, round 5); mixtral and exotic runtime layouts keep
    the per-layer path. QFA_FAST_RANDOM=0 restores the per-layer builder.
    """
    import os
    if (cfg.arch != "mixtral"
            and os.environ.get("QFA_FAST_RANDOM", "1") == "1"):
        try:
            return _fast_random_llama(cfg, get_codebook(codebook), seed,
                                      use_rand, dtype, quantize_head)
        except NotImplementedError:
            pass
    cb = get_codebook(codebook)
    rng = np.random.default_rng(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    def dense(out_f, in_f, scale=0.02):
        import jax
        key = jax.random.PRNGKey(int(rng.integers(0, 1 << 31)))
        w = jax.random.normal(key, (out_f, in_f), dtype) * scale
        return {"weight": w, "bias": None}

    def q(in_f, out_f, lspec=None, SU=None):
        return random_qlinear(cb, in_f, out_f, rng, use_rand, dtype=dtype,
                              lspec=lspec, SU=SU)

    def block():
        # shared left transforms per activation group (fusable at runtime)
        qkv_spec = get_hadK(D, use_rand=use_rand, rng=rng)
        qkv_su = np.sign(rng.standard_normal(D)).astype(np.float32)
        mlp_spec = get_hadK(D, use_rand=use_rand, rng=rng)
        mlp_su = np.sign(rng.standard_normal(D)).astype(np.float32)
        blk = {
            "input_layernorm": {"weight": jnp.ones((D,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((D,), dtype)},
            "self_attn": {
                "q_proj": q(D, H * hd, qkv_spec, qkv_su),
                "k_proj": q(D, KV * hd, qkv_spec, qkv_su),
                "v_proj": q(D, KV * hd, qkv_spec, qkv_su),
                "o_proj": q(H * hd, D),
            },
        }
        if cfg.arch == "mixtral":
            # w1/w3 share the expert's left transform (the quantizer's
            # share_group_transforms guarantee) — required for expert
            # stacking / the sparse MoE decode path
            experts = []
            for _ in range(cfg.num_local_experts):
                espec = get_hadK(D, use_rand=use_rand, rng=rng)
                esu = np.sign(rng.standard_normal(D)).astype(np.float32)
                experts.append(
                    {"w1": q(D, I, espec, esu) if quantize_experts
                     else dense(I, D),
                     "w3": q(D, I, espec, esu) if quantize_experts
                     else dense(I, D),
                     "w2": q(I, D) if quantize_experts else dense(D, I)})
            blk["block_sparse_moe"] = {
                "gate": dense(cfg.num_local_experts, D),
                "experts": experts,
            }
        else:
            blk["mlp"] = {"gate_proj": q(D, I, mlp_spec, mlp_su),
                          "up_proj": q(D, I, mlp_spec, mlp_su),
                          "down_proj": q(I, D)}
        return blk

    params = {
        "embed_tokens": dense(cfg.vocab_size, D),
        "layers": [block() for _ in range(cfg.num_hidden_layers)],
        "norm": {"weight": jnp.ones((D,), dtype)},
    }
    params["embed_tokens"].pop("bias")
    if not cfg.tie_word_embeddings:
        if quantize_head and cfg.vocab_size % 128 == 0:
            params["lm_head"] = q(D, cfg.vocab_size)
        else:
            params["lm_head"] = dense(cfg.vocab_size, D)
    return params
