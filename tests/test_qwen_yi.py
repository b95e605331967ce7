"""Legacy QWen-1 family (attn.c_attn / mlp.w1,w2,c_proj — reference
constants.py:30,57-58, merge map utils.py:170-175) and Yi ln1/ln2 naming
(utils.py:186-191)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import llama as L
from quip_for_all_tpu.models import qwen as QW
from quip_for_all_tpu.models.config import ModelConfig
from quip_for_all_tpu.nn.qlinear import QuantLinearParams
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.runtime.generate import generate, perplexity

pytestmark = pytest.mark.fast


def _tiny_qwen(**kw):
    base = dict(arch="qwen", vocab_size=256, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=4,
                max_position_embeddings=128, attention_bias=True)
    base.update(kw)
    return ModelConfig(**base)


def test_qwen_matches_llama_construction():
    """A QWen block IS a llama MHA block up to naming: c_attn = [q;k;v]
    rows, w1=up / w2=gate / c_proj=down. Constructing one from the other
    must give identical logits — the family implementation oracle
    (transformers has no native QWen-1 class to compare against)."""
    lcfg = ModelConfig(vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       max_position_embeddings=128, attention_bias=True)
    lp = L.init_llama_params(lcfg, seed=0)
    qcfg = _tiny_qwen()

    def to_qwen_block(b):
        a = b["self_attn"]
        c_attn_w = jnp.concatenate([a["q_proj"]["weight"],
                                    a["k_proj"]["weight"],
                                    a["v_proj"]["weight"]], axis=0)
        c_attn_b = jnp.concatenate([a["q_proj"]["bias"],
                                    a["k_proj"]["bias"],
                                    a["v_proj"]["bias"]])
        return {
            "ln_1": b["input_layernorm"],
            "ln_2": b["post_attention_layernorm"],
            "attn": {"c_attn": {"weight": c_attn_w, "bias": c_attn_b},
                     "c_proj": a["o_proj"]},
            "mlp": {"w1": b["mlp"]["up_proj"],
                    "w2": b["mlp"]["gate_proj"],
                    "c_proj": b["mlp"]["down_proj"]},
        }

    qp = {"wte": lp["embed_tokens"],
          "layers": [to_qwen_block(b) for b in lp["layers"]],
          "ln_f": lp["norm"], "lm_head": lp["lm_head"]}
    ids = jnp.asarray((np.arange(10) * 7 % 256)[None, :])
    ref, _ = L.model_apply(lcfg, lp, ids)
    ours, _ = QW.model_apply(qcfg, qp, ids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_qwen_quantize_generate_roundtrip(tmp_path):
    from quip_for_all_tpu.utils.checkpoint import (load_quantized,
                                                   save_quantized)
    cfg = _tiny_qwen()
    params = QW.init_qwen_params(cfg, seed=0)
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    blk = qparams["layers"][0]
    assert isinstance(blk["attn"]["c_attn"], QuantLinearParams)
    assert isinstance(blk["mlp"]["w1"], QuantLinearParams)
    # c_attn keeps its bias through quantization
    assert blk["attn"]["c_attn"].bias is not None

    out = np.asarray(generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 5,
                              cache_len=32, dtype_str="float32"))
    assert out.shape == (1, 8)
    assert np.isfinite(perplexity(
        cfg, qparams, synthetic_tokens(4, 24, cfg.vocab_size, 2),
        batch_size=4))

    d = str(tmp_path / "qw")
    save_quantized(cfg, qparams, q.to_dict(), d)
    with open(f"{d}/config.json") as f:
        assert json.load(f)["model_type"] == "qwen"
    cfg2, lp2, _ = load_quantized(d)
    assert cfg2.arch == "qwen"
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = QW.model_apply(cfg, qparams, ids)
    l2, _ = QW.model_apply(cfg2, lp2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_qwen_merge_suv_consistency():
    """merge_suv on qwen (ln_1 -> c_attn, ln_2 -> w1/w2, w1 -> c_proj):
    quality must stay in the non-merged band."""
    cfg = _tiny_qwen()
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    eval_toks = synthetic_tokens(8, 24, cfg.vocab_size, seed=2)
    ppls = {}
    for merge in (False, True):
        q = QuipQuantizer(codebook="D4", nsamples=16, batch_size=4,
                          quip_tune_iters=0, ft_epochs=0, merge_suv=merge)
        qp = q.quantize_model(cfg, QW.init_qwen_params(cfg, seed=0), calib)
        ppls[merge] = float(perplexity(cfg, qp, eval_toks, batch_size=4))
    assert ppls[True] < ppls[False] * 1.5, ppls
    assert ppls[False] < ppls[True] * 1.5, ppls


def test_qwen_hf_import(tmp_path):
    """QWen-1 HF layout (transformer.h.{i}.* names, intermediate_size
    stored pre-halving) imports and matches the native module."""
    from safetensors.numpy import save_file
    from quip_for_all_tpu.utils.hf_import import load_hf_model

    cfg = _tiny_qwen()
    params = QW.init_qwen_params(cfg, seed=0)
    flat = {"transformer.wte.weight": params["wte"]["weight"],
            "transformer.ln_f.weight": params["ln_f"]["weight"],
            "lm_head.weight": params["lm_head"]["weight"]}
    for i, b in enumerate(params["layers"]):
        p = f"transformer.h.{i}"
        flat[f"{p}.ln_1.weight"] = b["ln_1"]["weight"]
        flat[f"{p}.ln_2.weight"] = b["ln_2"]["weight"]
        flat[f"{p}.attn.c_attn.weight"] = b["attn"]["c_attn"]["weight"]
        flat[f"{p}.attn.c_attn.bias"] = b["attn"]["c_attn"]["bias"]
        flat[f"{p}.attn.c_proj.weight"] = b["attn"]["c_proj"]["weight"]
        for w in ("w1", "w2", "c_proj"):
            flat[f"{p}.mlp.{w}.weight"] = b["mlp"][w]["weight"]
    d = str(tmp_path / "qwen_hf")
    import os
    os.makedirs(d)
    save_file({k: np.asarray(v) for k, v in flat.items()},
              f"{d}/model.safetensors")
    with open(f"{d}/config.json", "w") as f:
        json.dump({"model_type": "qwen", "vocab_size": 256,
                   "hidden_size": 64, "intermediate_size": 256,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "kv_channels": 16, "seq_length": 128,
                   "layer_norm_epsilon": 1e-5,
                   "rotary_emb_base": 10000.0}, f)
    cfg2, p2 = load_hf_model(d)
    assert cfg2.arch == "qwen" and cfg2.intermediate_size == 128
    ids = jnp.asarray((np.arange(10) * 7 % 256)[None, :])
    l1, _ = QW.model_apply(cfg, params, ids)
    l2, _ = QW.model_apply(cfg2, p2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)


def test_yi_ln_alias_import(tmp_path):
    """Yi float checkpoints (ln1/ln2 norms, llama otherwise) import onto
    the llama pytree with identical logits."""
    from safetensors.numpy import save_file
    from quip_for_all_tpu.utils.hf_import import load_hf_model

    cfg = ModelConfig(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=128)
    params = L.init_llama_params(cfg, seed=0)
    flat = {"model.embed_tokens.weight": params["embed_tokens"]["weight"],
            "model.norm.weight": params["norm"]["weight"],
            "lm_head.weight": params["lm_head"]["weight"]}
    for i, b in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        flat[f"{p}.ln1.weight"] = b["input_layernorm"]["weight"]
        flat[f"{p}.ln2.weight"] = b["post_attention_layernorm"]["weight"]
        for w in ("q_proj", "k_proj", "v_proj", "o_proj"):
            flat[f"{p}.self_attn.{w}.weight"] = \
                b["self_attn"][w]["weight"]
        for w in ("gate_proj", "up_proj", "down_proj"):
            flat[f"{p}.mlp.{w}.weight"] = b["mlp"][w]["weight"]
    d = str(tmp_path / "yi_hf")
    import os
    os.makedirs(d)
    save_file({k: np.asarray(v) for k, v in flat.items()},
              f"{d}/model.safetensors")
    with open(f"{d}/config.json", "w") as f:
        json.dump({"model_type": "Yi", "vocab_size": 256,
                   "hidden_size": 64, "intermediate_size": 128,
                   "num_hidden_layers": 2, "num_attention_heads": 4,
                   "num_key_value_heads": 2,
                   "max_position_embeddings": 128,
                   "rms_norm_eps": 1e-5}, f)
    cfg2, p2 = load_hf_model(d)
    assert cfg2.arch == "llama"
    ids = jnp.asarray((np.arange(10) * 7 % 256)[None, :])
    l1, _ = L.model_apply(cfg, params, ids)
    l2, _ = L.model_apply(cfg2, p2, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=2e-4)


def test_qwen_fuse_for_inference_and_serving():
    """w1/w2 fuse into one decode launch (shared group transforms) with
    identical logits, and the serving engine runs the qwen family."""
    cfg = _tiny_qwen()
    calib = synthetic_tokens(16, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=16, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    qp = q.quantize_model(cfg, QW.init_qwen_params(cfg, seed=0), calib)
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    kw = {"compute_dtype": jnp.float32}
    ref, _ = QW.model_apply(cfg, qp, ids, linear_kw=kw)
    fp = QW.fuse_for_inference(cfg, qp)
    assert "w12_proj" in fp["layers"][0]["mlp"]
    out, _ = QW.model_apply(cfg, fp, ids, linear_kw=kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    from quip_for_all_tpu.runtime.serving import ServingEngine
    eng = ServingEngine(cfg, qp, max_batch=2, cache_len=64,
                        dtype=jnp.float32, prefill_chunk=8)
    rid = eng.add_request(np.array([1, 2, 3], dtype=np.int32),
                          max_new_tokens=5)
    res = eng.run(max_steps=50)
    assert res[rid].shape[0] == 8
