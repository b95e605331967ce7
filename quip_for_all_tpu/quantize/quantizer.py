"""QuipQuantizer: end-to-end model quantization orchestrator.

Parity target: ``/root/reference/quantizer.py`` (QuipQuantizer.quantize_model,
§3.1 of SURVEY.md). Functional pipeline over our native model pytrees:

  1. embed calibration batches -> first-block inputs
  2. per block: one capture pass accumulates Hessians for every linear
     sub-layer group (the hook replay at quantizer.py:426-465), computing the
     float block outputs that become the next block's inputs (the reference
     feeds FLOAT outputs forward, not quantized ones — quantizer.py:450,571)
  3. per sub-layer group (qkv -> o -> gate/up -> down, utils.py:199-207):
     LDLQ-quantize each linear against the group Hessian, pack into
     QuantLinearParams, swap into the block params
  4. optional block-wise MSE finetune of SU/SV + remaining float weights
     (quantize/finetune.py), then optional end-to-end CE finetune
  5. save (reference-compatible checkpoint schema)

TP-native extension (absent upstream — README.md:84 declares tensor
parallelism impossible with Hadamard transforms): ``tp_shards`` > 1 makes
the incoherence transform block-diagonal (I_s ⊗ U_{n/s}) along the dimension
that tensor parallelism shards for each layer role, so each TP shard applies
its local factor with no cross-shard collective. See parallel/sharding.py.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import pickle
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import get_codebook
from ..models import llama as M
from ..models.config import ModelConfig
from ..quantize import hessian
from ..quantize.quip import (LayerQuantAttrs, QuantConfig, pack_to_qlinear,
                             quantize_layer)
from ..transforms.incoherence import get_hadK

logger = logging.getLogger(__name__)


def _get_nested(d, path: str):
    cur = d
    for part in path.split("."):
        cur = cur[int(part)] if part.isdigit() else cur[part]
    return cur


def _set_nested(d, path: str, value):
    parts = path.split(".")
    cur = d
    for part in parts[:-1]:
        cur = cur[int(part)] if part.isdigit() else cur[part]
    last = parts[-1]
    if last.isdigit():
        cur[int(last)] = value
    else:
        cur[last] = value


def sublayer_groups(cfg: ModelConfig) -> List[Dict[str, Any]]:
    """Quantization order within a block: qkv -> o -> fc1 -> fc2
    (parity: utils.py:199-207 + constants.py patterns). Each entry maps a
    capture key to the linear layer paths fed by that activation."""
    if cfg.arch == "gpt2":
        return [
            {"capture": "qkv", "layers": ["attn.c_attn"]},
            {"capture": "o", "layers": ["attn.c_proj"]},
            {"capture": "fc1", "layers": ["mlp.c_fc"]},
            {"capture": "fc2", "layers": ["mlp.c_proj"]},
        ]
    if cfg.arch == "gpt_neox":
        return [
            {"capture": "qkv", "layers": ["attention.query_key_value"]},
            {"capture": "o", "layers": ["attention.dense"]},
            {"capture": "fc1", "layers": ["mlp.dense_h_to_4h"]},
            {"capture": "fc2", "layers": ["mlp.dense_4h_to_h"]},
        ]
    if cfg.arch == "falcon":
        return [
            {"capture": "qkv",
             "layers": ["self_attention.query_key_value"]},
            {"capture": "o", "layers": ["self_attention.dense"]},
            {"capture": "fc1", "layers": ["mlp.dense_h_to_4h"]},
            {"capture": "fc2", "layers": ["mlp.dense_4h_to_h"]},
        ]
    if cfg.arch == "phi":
        return [
            {"capture": "qkv", "layers": ["self_attn.q_proj",
                                          "self_attn.k_proj",
                                          "self_attn.v_proj"]},
            {"capture": "o", "layers": ["self_attn.dense"]},
            {"capture": "fc1", "layers": ["mlp.fc1"]},
            {"capture": "fc2", "layers": ["mlp.fc2"]},
        ]
    if cfg.arch == "gptj":
        return [
            {"capture": "qkv", "layers": ["attn.q_proj", "attn.k_proj",
                                          "attn.v_proj"]},
            {"capture": "o", "layers": ["attn.out_proj"]},
            {"capture": "fc1", "layers": ["mlp.fc_in"]},
            {"capture": "fc2", "layers": ["mlp.fc_out"]},
        ]
    if cfg.arch == "opt":
        return [
            {"capture": "qkv", "layers": ["self_attn.q_proj",
                                          "self_attn.k_proj",
                                          "self_attn.v_proj"]},
            {"capture": "o", "layers": ["self_attn.out_proj"]},
            {"capture": "fc1", "layers": ["fc1"]},
            {"capture": "fc2", "layers": ["fc2"]},
        ]
    if cfg.arch == "mixtral":
        groups = [
            {"capture": "qkv", "layers": ["self_attn.q_proj",
                                          "self_attn.k_proj",
                                          "self_attn.v_proj"]},
            {"capture": "o", "layers": ["self_attn.o_proj"]},
        ]
        for e in range(cfg.num_local_experts):
            groups.append({"capture": "moe_input", "routing_expert": e,
                           "layers": [f"block_sparse_moe.experts.{e}.w1",
                                      f"block_sparse_moe.experts.{e}.w3"]})
        for e in range(cfg.num_local_experts):
            groups.append({"capture": f"expert{e}_down",
                           "layers": [f"block_sparse_moe.experts.{e}.w2"]})
        return groups
    if cfg.arch == "qwen":
        # legacy QWen-1 names (reference constants.py:30,57-58 + sublayer
        # split utils.py:199-207): fused c_attn, w1/w2 share the ln_2
        # activation, c_proj consumes the product
        return [
            {"capture": "qkv", "layers": ["attn.c_attn"]},
            {"capture": "o", "layers": ["attn.c_proj"]},
            {"capture": "fc1", "layers": ["mlp.w1", "mlp.w2"]},
            {"capture": "fc2", "layers": ["mlp.c_proj"]},
        ]
    if cfg.arch == "baichuan":
        return [
            {"capture": "qkv", "layers": ["self_attn.W_pack"]},
            {"capture": "o", "layers": ["self_attn.o_proj"]},
            {"capture": "gateup", "layers": ["mlp.gate_proj",
                                             "mlp.up_proj"]},
            {"capture": "down", "layers": ["mlp.down_proj"]},
        ]
    return [
        {"capture": "qkv", "layers": ["self_attn.q_proj", "self_attn.k_proj",
                                      "self_attn.v_proj"]},
        {"capture": "o", "layers": ["self_attn.o_proj"]},
        {"capture": "gateup", "layers": ["mlp.gate_proj", "mlp.up_proj"]},
        {"capture": "down", "layers": ["mlp.down_proj"]},
    ]


@dataclasses.dataclass
class QuipQuantizer:
    """Constructor knobs mirror the reference (``quantizer.py:58-89``)."""
    codebook: str
    nsamples: int = 4096
    model_seqlen: int = 2048
    quip_tune_iters: int = 10
    sigma_reg: float = 0.01
    rescale_WH: bool = False
    use_rand: bool = True
    scale_override: float = -1.0
    opt_resid_scale: float = -1.0
    per_channel: bool = False
    batch_size: int = 4
    modules_to_not_convert: Optional[List[str]] = None
    merge_suv: bool = False
    # finetune knobs (quantize/finetune.py)
    ft_lr: float = 5e-5
    ft_susv_lr: float = 5e-4
    ft_epochs: int = 0
    ft_train_size: int = 384
    ft_valid_size: int = 128
    ft_batch_size: int = 8
    ft_valid_freq: int = 1
    ft_early_stop: int = 3
    # end-to-end CE finetune over a pp-stage pipeline mesh when the model
    # exceeds one chip (the reference pipelines e2e ft across GPUs via
    # accelerate device_map — quantizer.py:626-638; here it is a real
    # GPipe microbatch pipeline, parallel/pipeline.py). 1 = single device.
    ft_pp: int = 1
    # microbatches for the pipelined ft step; 0 = one per sample
    ft_microbatches: int = 0
    # TPU-native: tensor-parallel-ready block-diagonal transforms
    tp_shards: int = 1
    # TPU-native: share SU + left transform across layers fed by the same
    # activation (qkv, gate/up, expert w1/w3) so they can run as ONE fused
    # decode+matmul launch at inference (nn.qlinear.fuse_qlinears)
    share_group_transforms: bool = True
    # quantize the output head too (the reference leaves it fp16; at bs=1
    # decode the dense head costs a full vocab*hidden read per token)
    quantize_lm_head: bool = False
    # store inter-block calibration activations as fp16 on host — halves
    # the dominant quantization-time memory (the reference needs
    # 500-750GB CPU RAM at nsamples=4096, README.md:38; its torch model
    # runs in fp16 so its activations carry the same rounding). Hessian
    # accumulation is f32-Kahan either way (quantize/hessian.py).
    calib_act_fp16: bool = True
    seed: int = 0

    def __post_init__(self):
        self.cb = get_codebook(
            self.codebook,
            self.opt_resid_scale if self.opt_resid_scale > 0 else None)
        if not (0 < self.sigma_reg < 1):
            raise ValueError("sigma_reg must be in (0, 1)")

    # ------------------------------------------------------------ config IO

    def to_dict(self) -> dict:
        """quantization_config.json schema — parity: quantizer.py:132-147."""
        return {
            "quant_method": "QUiP",
            "rescale_WH": self.rescale_WH,
            "use_rand": self.use_rand,
            "codebook": self.cb.id,
            "codesz": self.cb.codesz,
            "idx_dtype": f"torch.{self.cb.idx_dtype.name}",
            "merge_suv": self.merge_suv,
            "per_channel": self.per_channel,
            "opt_resid_scale": self.opt_resid_scale,
            "modules_to_not_convert": self.modules_to_not_convert,
            "tp_shards": self.tp_shards,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "QuipQuantizer":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        return cls(**kw)

    # ------------------------------------------------------------ pipeline

    def _quant_cfg(self) -> QuantConfig:
        return QuantConfig(
            rescale_WH=self.rescale_WH, sigma_reg=self.sigma_reg,
            scale_override=self.scale_override, use_rand=self.use_rand,
            per_channel=self.per_channel,
            quip_tune_iters=self.quip_tune_iters)

    def _skip(self, path: str) -> bool:
        for pat in (self.modules_to_not_convert or []):
            if pat in path:
                return True
        return False

    def _merge_spec(self, cfg: ModelConfig) -> Dict[str, Any]:
        """Per-arch merge_suv graph (parity: utils.py:160-196 — the
        reference covers llama/mistral, qwen, mixtral, yi; mistral/qwen2/yi
        all load as arch="llama" here, and we add baichuan).

        Returns {"signs": {key: size}, "map": {path: (su_key, sv_key)},
        "norm_folds": [(norm_path, key)], "linear_folds": [(path, key)]}.
        Producer SV == consumer SU (same sign vector) so the pair cancels
        at the interface; block-input signs are folded into the producing
        norm's weight (signs are +-1 so mul == div), and signs feeding an
        UNQUANTIZED linear (the mixtral router gate) are folded into its
        weight columns like the reference's `weight.div_(SU)`
        (quantizer.py:588-595)."""
        D, I = cfg.hidden_size, cfg.intermediate_size
        full_o = cfg.num_key_value_heads == cfg.num_attention_heads
        o_dim = cfg.num_attention_heads * cfg.head_dim
        norm_folds = [("input_layernorm", "qkv_in"),
                      ("post_attention_layernorm", "mlp_in")]
        if cfg.arch in ("llama", "baichuan"):
            signs = {"qkv_in": D, "mlp_in": D, "down_in": I}
            if full_o:
                signs["o_in"] = o_dim
            if cfg.arch == "baichuan":
                mp = {"self_attn.W_pack": ("qkv_in", None)}
            else:
                mp = {
                    "self_attn.q_proj": ("qkv_in", None),
                    "self_attn.k_proj": ("qkv_in", None),
                    "self_attn.v_proj": ("qkv_in",
                                         "o_in" if full_o else None),
                }
            if full_o and cfg.arch == "llama":
                mp["self_attn.o_proj"] = ("o_in", None)
            mp.update({
                "mlp.gate_proj": ("mlp_in", None),
                "mlp.up_proj": ("mlp_in", "down_in"),
                "mlp.down_proj": ("down_in", None),
            })
            return {"signs": signs, "map": mp, "norm_folds": norm_folds,
                    "linear_folds": []}
        if cfg.arch == "qwen":
            # reference merge graph utils.py:170-175: ln_1 -> c_attn;
            # ln_2 -> w1,w2; w1's output sign -> c_proj (the elementwise
            # product w1 * silu(w2) carries w1's sign through)
            signs = {"qkv_in": D, "mlp_in": D, "down_in": I}
            mp = {
                "attn.c_attn": ("qkv_in", None),
                "mlp.w1": ("mlp_in", "down_in"),
                "mlp.w2": ("mlp_in", None),
                "mlp.c_proj": ("down_in", None),
            }
            return {"signs": signs, "map": mp,
                    "norm_folds": [("ln_1", "qkv_in"),
                                   ("ln_2", "mlp_in")],
                    "linear_folds": []}
        if cfg.arch == "mixtral":
            signs = {"qkv_in": D, "mlp_in": D}
            if full_o:
                signs["o_in"] = o_dim
            mp = {
                "self_attn.q_proj": ("qkv_in", None),
                "self_attn.k_proj": ("qkv_in", None),
                "self_attn.v_proj": ("qkv_in", "o_in" if full_o else None),
            }
            if full_o:
                mp["self_attn.o_proj"] = ("o_in", None)
            for e in range(cfg.num_local_experts):
                signs[f"down_in_e{e}"] = I
                pre = f"block_sparse_moe.experts.{e}"
                mp[f"{pre}.w1"] = ("mlp_in", None)
                mp[f"{pre}.w3"] = ("mlp_in", f"down_in_e{e}")
                mp[f"{pre}.w2"] = (f"down_in_e{e}", None)
            return {"signs": signs, "map": mp, "norm_folds": norm_folds,
                    "linear_folds": [("block_sparse_moe.gate", "mlp_in")]}
        raise ValueError(
            f"merge_suv not supported for arch {cfg.arch!r}; set "
            "merge_suv=False (parity: utils.py:195-196)")

    def quantize_model(self, cfg: ModelConfig, params: Dict[str, Any],
                      calib_tokens: np.ndarray,
                      dtype=jnp.float32,
                      resume_dir: Optional[str] = None) -> Dict[str, Any]:
        """Quantize in place and return params.

        calib_tokens: (nsamples_total, seqlen) int32 token ids. When
        ft_epochs > 0 the trailing ft_train_size + ft_valid_size samples are
        reserved for finetuning (parity: quantizer.py:117-120).

        resume_dir: when set, each completed block's quantized params are
        checkpointed there and a re-run with the SAME original params and
        calibration data resumes after the last completed block (replaying
        only the cheap float forwards). The reference has no
        mid-quantization resume — a crash at block 40/80 restarts from
        scratch (SURVEY.md §5).
        """
        if self.ft_epochs > 0 and self.merge_suv:
            raise ValueError("finetune mode is incompatible with merge_suv")
        merge_spec = self._merge_spec(cfg) if self.merge_suv else None
        rng = np.random.default_rng(self.seed)
        n_batches = calib_tokens.shape[0] // self.batch_size
        n_hess = min(n_batches, max(1, self.nsamples // self.batch_size))
        n_ft = n_batches - n_hess if self.ft_epochs > 0 else 0
        batches = [
            jnp.asarray(calib_tokens[i * self.batch_size:
                                     (i + 1) * self.batch_size])
            for i in range(n_hess + n_ft)
        ]
        from ..models import registry as R
        ARCH = R.get_arch(cfg)
        B, S = self.batch_size, calib_tokens.shape[1]
        positions = jnp.arange(S)[None, :].repeat(B, 0)
        cos, sin = R.rope_tables(cfg, positions)
        mask = M.causal_mask(S, S)
        n_valid = max(1, self.ft_valid_size // self.batch_size) \
            if n_ft > 0 else 0

        act_dt = np.float16 if self.calib_act_fp16 else None
        def host(a):
            a = np.asarray(a)
            return a.astype(act_dt) if act_dt is not None else a
        embed = jax.jit(lambda ids: R.embed(cfg, params, ids, positions,
                                            dtype))
        layer_inputs = [host(embed(b)) for b in batches]

        groups = sublayer_groups(cfg)
        cap_keys = sorted({g["capture"] for g in groups})

        def _dev(x):
            # stored-fp16 activations upcast on device: compute precision
            # stays `dtype`; only HOST storage is halved
            return jnp.asarray(x, dtype=dtype)

        block_fwd = jax.jit(
            lambda blk, x: ARCH.block_apply(cfg, blk, x, cos, sin,
                                            attn_mask=mask, capture=True))
        plain_fwd = jax.jit(
            lambda blk, x: ARCH.block_apply(cfg, blk, x, cos, sin,
                                            attn_mask=mask)[0])

        done_upto = -1
        if resume_dir:
            meta_path = os.path.join(resume_dir, "resume.json")
            if os.path.isfile(meta_path):
                with open(meta_path) as f:
                    done_upto = json.load(f).get("completed", -1)
                logger.info("resuming after block %d", done_upto)

        for i in range(cfg.num_hidden_layers):
            t0 = time.time()
            blk = params["layers"][i]

            if resume_dir and i <= done_upto:
                # replay float forward only, then swap in the saved block
                layer_inputs = [host(plain_fwd(blk, _dev(x)))
                                for x in layer_inputs]
                with open(os.path.join(resume_dir, f"block_{i}.pkl"),
                          "rb") as f:
                    params["layers"][i] = jax.tree_util.tree_map(
                        jnp.asarray, pickle.load(f))
                continue
            merge = {}
            if merge_spec:
                merge = {k: np.sign(rng.standard_normal(n) + 1e-5
                                    ).astype(np.float32)
                         for k, n in merge_spec["signs"].items()}
            # ---- capture pass: Hessians (first n_hess batches) + float
            # outputs for every batch (targets + next-block inputs)
            hs: Dict[str, hessian.HessianState] = {}
            outputs = []
            for bi, x_in in enumerate(layer_inputs):
                y, _, caps = block_fwd(blk, _dev(x_in))
                outputs.append(host(y))
                if bi >= n_hess:
                    continue
                for key in cap_keys:
                    if key not in caps:
                        continue
                    act = caps[key]
                    if key == "moe_input":
                        routing = np.asarray(caps["moe_routing"])
                        for e in range(cfg.num_local_experts):
                            k_e = f"moe_input_e{e}"
                            m_act = act * (routing[..., e:e + 1] > 0)
                            if k_e not in hs:
                                hs[k_e] = hessian.HessianState.zeros(
                                    act.shape[-1])
                            hs[k_e] = hessian.accumulate(hs[k_e],
                                                         jnp.asarray(m_act))
                        continue
                    if key == "moe_routing":
                        continue
                    if key not in hs:
                        hs[key] = hessian.HessianState.zeros(act.shape[-1])
                    hs[key] = hessian.accumulate(hs[key], act)

            # ---- quantize groups sequentially (+ block finetune between)
            merge_map = merge_spec["map"] if merge_spec else {}
            for gi, g in enumerate(groups):
                key = g["capture"]
                if key == "moe_input":
                    key = f"moe_input_e{g['routing_expert']}"
                if key not in hs:
                    continue
                H = np.asarray(hessian.finalize(hs[key]))
                from ..parallel.sharding import role_of
                shared_SU = None
                shared_lspec = None
                if self.share_group_transforms and len(g["layers"]) > 1:
                    n_in = H.shape[0]
                    shared_SU = np.sign(rng.standard_normal(n_in) + 1e-5
                                        ).astype(np.float32)
                    l_shards = (self.tp_shards if self.tp_shards > 1
                                and role_of(g["layers"][0]) == "row"
                                and n_in % self.tp_shards == 0 else 1)
                    shared_lspec = get_hadK(n_in, self.use_rand, rng,
                                            shards=l_shards)
                for path in g["layers"]:
                    if self._skip(path):
                        continue
                    lin = _get_nested(blk, path)
                    if not isinstance(lin, dict) or "weight" not in lin:
                        continue
                    W = np.asarray(lin["weight"], dtype=np.float32)
                    SU = SV = None
                    su_is_merged = None
                    if merge:
                        su_key, sv_key = merge_map.get(path, (None, None))
                        SU = merge.get(su_key) if su_key else None
                        SV = merge.get(sv_key) if sv_key else None
                    elif shared_SU is not None:
                        SU = shared_SU
                        su_is_merged = False  # applied at runtime, shared
                    lspec, rspec = shared_lspec, None
                    if self.tp_shards > 1:
                        # block-diagonal transform on the TP-sharded dim
                        # (col-parallel: out; row-parallel: in) — see
                        # parallel/sharding.py role tables
                        role = role_of(path)
                        if role == "col" and W.shape[0] % self.tp_shards \
                                == 0:
                            rspec = get_hadK(W.shape[0], self.use_rand,
                                             rng, shards=self.tp_shards)
                        elif role == "row" and lspec is None and \
                                W.shape[1] % self.tp_shards == 0:
                            lspec = get_hadK(W.shape[1], self.use_rand,
                                             rng, shards=self.tp_shards)
                    attrs, W_hat = quantize_layer(
                        W, H, self.cb, self._quant_cfg(), rng, SU=SU, SV=SV,
                        lspec=lspec, rspec=rspec, su_is_merged=su_is_merged)
                    qp = pack_to_qlinear(
                        attrs, self.cb,
                        bias=None if lin.get("bias") is None
                        else np.asarray(lin["bias"], dtype=np.float32),
                        per_channel=self.per_channel)
                    _set_nested(blk, path, qp)
                    del W_hat

                if self.ft_epochs > 0 and gi < len(groups) - 1:
                    from . import finetune as FT
                    blk = FT.finetune_block(
                        cfg, blk,
                        [layer_inputs[k] for k in range(n_hess,
                                                        len(batches))],
                        [outputs[k] for k in range(n_hess, len(batches))],
                        cos, sin, mask,
                        ft_susv_lr=self.ft_susv_lr, ft_lr=self.ft_lr,
                        epochs=self.ft_epochs,
                        valid_frac=max(1, (n_ft // max(n_valid, 1))),
                        early_stop=self.ft_early_stop)
                    params["layers"][i] = blk

            if merge:
                # fold interface signs into the producing norms and into
                # any unquantized consumer linears (the mixtral router
                # gate) — quantizer.py:579-595; signs are +-1 so mul == div
                for norm_name, s_key in merge_spec["norm_folds"]:
                    wn = np.asarray(blk[norm_name]["weight"],
                                    dtype=np.float32) * merge[s_key]
                    blk[norm_name]["weight"] = jnp.asarray(wn, dtype=dtype)
                for path, s_key in merge_spec["linear_folds"]:
                    lin = _get_nested(blk, path)
                    wl = np.asarray(lin["weight"],
                                    dtype=np.float32) * merge[s_key][None, :]
                    lin["weight"] = jnp.asarray(wl, dtype=dtype)

            logger.info("block %d/%d quantized in %.1fs", i + 1,
                        cfg.num_hidden_layers, time.time() - t0)
            if resume_dir:
                os.makedirs(resume_dir, exist_ok=True)
                with open(os.path.join(resume_dir, f"block_{i}.pkl"),
                          "wb") as f:
                    pickle.dump(jax.device_get(params["layers"][i]), f)
                with open(os.path.join(resume_dir, "resume.json"),
                          "w") as f:
                    json.dump({"completed": i}, f)
            # next block consumes this block's float outputs
            layer_inputs = outputs

        head_key = R.untied_head_key(cfg, params)
        float_head = None     # teacher head for the e2e ft (pre-quantized)
        if self.quantize_lm_head and head_key is not None:
            float_head = params[head_key]
            hst = hessian.HessianState.zeros(cfg.hidden_size)
            norm_fn = jax.jit(
                lambda x: R.final_hidden(cfg, params,
                         jnp.asarray(x, jnp.float32)))
            for x in layer_inputs[:n_hess]:
                hst = hessian.accumulate(hst, norm_fn(x))
            H = np.asarray(hessian.finalize(hst))
            lin = params[head_key]
            W = np.asarray(lin["weight"], dtype=np.float32)
            attrs, _ = quantize_layer(W, H, self.cb, self._quant_cfg(), rng)
            params[head_key] = pack_to_qlinear(
                attrs, self.cb,
                bias=None if lin.get("bias") is None
                else np.asarray(lin["bias"], dtype=np.float32),
                per_channel=self.per_channel)
            logger.info("%s quantized", head_key)

        if self.ft_epochs > 0:
            params = self._finetune_end2end(cfg, params, batches,
                                            layer_inputs, n_hess, n_valid,
                                            float_head=float_head)
        return params

    def _finetune_end2end(self, cfg, params, batches, last_outputs,
                          n_hess, n_valid, float_head=None):
        """End-to-end CE finetune against the float model's output
        distributions (parity: quantizer.py:597-702). When the lm_head was
        quantized, ``float_head`` is its pre-quantization snapshot — the
        TEACHER must project with the float head, not the student's."""
        import optax
        from . import finetune as FT

        from ..models import registry as R
        from ..models.llama import linear_apply

        @jax.jit
        def head_probs(x):
            h = R.final_hidden(cfg, params,
                               jnp.asarray(x, jnp.float32))
            if float_head is not None:
                logits = linear_apply(float_head, h)
            else:
                logits = R.head_logits(cfg, params, h)
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        ft_ids = batches[n_hess:]
        targets = [np.asarray(head_probs(o)) for o in last_outputs[n_hess:]]
        if not ft_ids:
            return params

        flat = FT.collect_trainable(params["layers"])
        opt = FT.make_susv_optimizer(self.ft_susv_lr, self.ft_lr)
        opt_state = opt.init(flat)

        from ..models.registry import get_arch
        ARCH = get_arch(cfg)

        mesh = None
        if self.ft_pp > 1:
            from ..parallel.pipeline import make_pp_mesh, pipeline_logits
            if cfg.num_hidden_layers % self.ft_pp:
                raise ValueError(
                    f"ft_pp={self.ft_pp} must divide num_hidden_layers="
                    f"{cfg.num_hidden_layers}")
            mesh = make_pp_mesh(self.ft_pp)
            n_micro = self.ft_microbatches or self.ft_batch_size
            logger.info("end2end ft pipelined over %d stages, %d "
                        "microbatches", self.ft_pp, n_micro)

        def loss_fn(flat, ids, tgt):
            layers = FT.apply_trainable(params["layers"], flat)
            p2 = dict(params)
            p2["layers"] = layers
            if mesh is not None:
                logits = pipeline_logits(
                    cfg, p2, ids, mesh, n_microbatches=n_micro,
                    linear_kw={"training": True})
            else:
                logits, _ = ARCH.model_apply(cfg, p2, ids,
                                             linear_kw={"training": True})
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            return -(tgt * logp).sum(-1).mean()

        @jax.jit
        def step(flat, opt_state, ids, tgt):
            loss, grads = jax.value_and_grad(loss_fn)(flat, ids, tgt)
            upd, opt_state = opt.update(grads, opt_state, flat)
            return optax.apply_updates(flat, upd), opt_state, loss

        eval_loss = jax.jit(loss_fn)
        tr_ids, tr_tg = ft_ids[:-n_valid], targets[:-n_valid]
        va_ids, va_tg = ft_ids[-n_valid:], targets[-n_valid:]

        def vloss(flat):
            return float(np.mean([eval_loss(flat, a, jnp.asarray(b))
                                  for a, b in zip(va_ids, va_tg)]))

        initial = vloss(flat)
        best, best_flat, worse = initial, flat, 0
        logger.info("end2end initial loss %.5f", best)
        for ep in range(self.ft_epochs):
            for a, b in zip(tr_ids, tr_tg):
                flat, opt_state, _ = step(flat, opt_state, a,
                                          jnp.asarray(b))
            cur = vloss(flat)
            if cur < best:
                logger.info("end2end epoch %d loss %.5f BETTER", ep, cur)
                best, best_flat, worse = cur, flat, 0
            else:
                worse += 1
                if worse >= self.ft_early_stop:
                    break
        # observability hook (tests + progress reporting)
        self.e2e_ft_stats_ = {"initial": initial, "best": best}
        params["layers"] = FT.apply_trainable(params["layers"], best_flat)
        return params
