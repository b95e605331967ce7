"""Pattern-based genericity (VERDICT r4 #6; reference constants.py:19-24 +
utils.py:76-120): a checkpoint whose model_type is NOT in the family
registry, using llama-original tensor naming and alias config keys, must
import, quantize, and generate — with a loud warning — instead of
hard-failing.
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp


def _write_alien_checkpoint(tmpdir: str):
    """Tiny llama-shaped model saved with (a) an unknown model_type,
    (b) alias config keys (d_model/n_layers/...), and (c) llama-original
    tensor names (tok_embeddings, attention.wq, feed_forward.w1, ...)."""
    from safetensors.numpy import save_file

    from quip_for_all_tpu.models.config import tiny_config
    from quip_for_all_tpu.models.llama import init_llama_params
    cfg = tiny_config(vocab_size=256)
    params = init_llama_params(cfg, seed=0)

    t = {}

    def put(name, arr):
        t[name] = np.asarray(arr, dtype=np.float32)

    put("tok_embeddings.weight", params["embed_tokens"]["weight"])
    put("norm.weight", params["norm"]["weight"])
    put("output.weight", params["lm_head"]["weight"])
    for i, blk in enumerate(params["layers"]):
        p = f"layers.{i}"
        put(f"{p}.attention_norm.weight",
            blk["input_layernorm"]["weight"])
        put(f"{p}.ffn_norm.weight",
            blk["post_attention_layernorm"]["weight"])
        for ours, theirs in (("q_proj", "wq"), ("k_proj", "wk"),
                             ("v_proj", "wv"), ("o_proj", "wo")):
            put(f"{p}.attention.{theirs}.weight",
                blk["self_attn"][ours]["weight"])
        for ours, theirs in (("gate_proj", "w1"), ("up_proj", "w3"),
                             ("down_proj", "w2")):
            put(f"{p}.feed_forward.{theirs}.weight",
                blk["mlp"][ours]["weight"])
    os.makedirs(tmpdir, exist_ok=True)
    save_file(t, os.path.join(tmpdir, "model.safetensors"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({
            "model_type": "frontierlm",          # not in any registry
            "vocab_size": cfg.vocab_size,
            "d_model": cfg.hidden_size,          # alias keys
            "n_layers": cfg.num_hidden_layers,
            "n_heads": cfg.num_attention_heads,
            "n_kv_heads": cfg.num_key_value_heads,
            "ffn_hidden_size": cfg.intermediate_size,
            "max_sequence_length": 128,
        }, f)
    return cfg, params


@pytest.mark.fast
def test_unknown_model_type_imports_with_warning(tmp_path, caplog):
    import logging

    from quip_for_all_tpu.utils.hf_import import load_hf_model
    cfg0, params0 = _write_alien_checkpoint(str(tmp_path))
    with caplog.at_level(logging.WARNING):
        cfg, params = load_hf_model(str(tmp_path), dtype=jnp.float32)
    assert any("frontierlm" in r.message for r in caplog.records), \
        "expected a loud unknown-family warning"
    assert cfg.arch == "llama"
    assert cfg.hidden_size == cfg0.hidden_size
    assert cfg.num_hidden_layers == cfg0.num_hidden_layers
    assert cfg.num_key_value_heads == cfg0.num_key_value_heads
    # weights landed at the right places
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["self_attn"]["q_proj"]["weight"]),
        np.asarray(params0["layers"][0]["self_attn"]["q_proj"]["weight"]))
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["mlp"]["down_proj"]["weight"]),
        np.asarray(params0["layers"][1]["mlp"]["down_proj"]["weight"]))


@pytest.mark.slow
def test_unknown_model_type_quantize_generate(tmp_path):
    """The VERDICT's done-criterion: quantize + generate work end-to-end
    on the alien checkpoint."""
    import quip_for_all_tpu as qfa
    from quip_for_all_tpu.data.calibration import synthetic_tokens
    from quip_for_all_tpu.utils.hf_import import load_hf_model
    _write_alien_checkpoint(str(tmp_path))
    cfg, params = load_hf_model(str(tmp_path), dtype=jnp.float32)
    calib = synthetic_tokens(8, 32, cfg.vocab_size, seed=1)
    q = qfa.QuipQuantizer(codebook="D4", nsamples=8, batch_size=4,
                          ft_epochs=0)
    qparams = q.quantize_model(cfg, params, calib)
    out = qfa.generate(cfg, qparams, jnp.asarray([[1, 2, 3]]), 8,
                       cache_len=32, dtype_str="float32")
    assert np.asarray(out).shape == (1, 11)
