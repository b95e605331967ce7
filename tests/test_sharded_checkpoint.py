"""Sharded checkpoint save/load: size-capped safetensors shards +
model.safetensors.index.json (reference quantizer.py:718-756 saves 10GB
accelerate shards; our loader reads the same HF index layout)."""
import json
import os

import numpy as np

import jax.numpy as jnp

from quip_for_all_tpu.data.calibration import synthetic_tokens
from quip_for_all_tpu.models import gpt2 as G
from quip_for_all_tpu.models.config import ModelConfig
from quip_for_all_tpu.quantize.quantizer import QuipQuantizer
from quip_for_all_tpu.utils.checkpoint import (hf_config_dict, load_quantized,
                                               save_quantized)


def _tiny_gpt2():
    return ModelConfig(arch="gpt2", vocab_size=256, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=4,
                       max_position_embeddings=128,
                       tie_word_embeddings=True)


def _quantized_tiny():
    cfg = _tiny_gpt2()
    params = G.init_gpt2_params(cfg, seed=0)
    calib = synthetic_tokens(8, 24, cfg.vocab_size, seed=1)
    q = QuipQuantizer(codebook="E8P12", nsamples=8, batch_size=4,
                      quip_tune_iters=0, ft_epochs=0)
    return cfg, q.quantize_model(cfg, params, calib), q.to_dict()


def test_sharded_save_roundtrip(tmp_path):
    cfg, qparams, qcfg = _quantized_tiny()
    d = str(tmp_path / "sharded")
    # Tiny cap forces many shards (embed alone is 256*64*4 = 64KB).
    save_quantized(cfg, qparams, qcfg, d, max_shard_size="80KB")

    index = os.path.join(d, "model.safetensors.index.json")
    assert os.path.isfile(index)
    assert not os.path.exists(os.path.join(d, "model.safetensors"))
    with open(index) as f:
        idx = json.load(f)
    shard_files = sorted(set(idx["weight_map"].values()))
    assert len(shard_files) >= 2
    n = len(shard_files)
    assert shard_files == [f"model-{i:05d}-of-{n:05d}.safetensors"
                           for i in range(1, n + 1)]
    for fn in shard_files:
        assert os.path.getsize(os.path.join(d, fn)) > 0
    total = sum(os.path.getsize(os.path.join(d, fn)) for fn in shard_files)
    # header overhead per shard, but tensor bytes must match the metadata
    assert total >= idx["metadata"]["total_size"]

    cfg2, lp, _ = load_quantized(d)
    ids = jnp.asarray(synthetic_tokens(2, 12, cfg.vocab_size, 3))
    l1, _ = G.model_apply(cfg, qparams, ids)
    l2, _ = G.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_single_file_when_under_cap(tmp_path):
    cfg, qparams, qcfg = _quantized_tiny()
    d = str(tmp_path / "single")
    save_quantized(cfg, qparams, qcfg, d)  # default 10GB cap
    assert os.path.isfile(os.path.join(d, "model.safetensors"))
    assert not os.path.exists(
        os.path.join(d, "model.safetensors.index.json"))
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.arch == "gpt2"


def test_resave_single_after_sharded(tmp_path):
    """Re-saving into the same dir with a larger cap must not leave a stale
    index (and vice versa) — the loader prefers the index when present."""
    cfg, qparams, qcfg = _quantized_tiny()
    d = str(tmp_path / "re")
    save_quantized(cfg, qparams, qcfg, d, max_shard_size="80KB")
    assert os.path.isfile(os.path.join(d, "model.safetensors.index.json"))
    save_quantized(cfg, qparams, qcfg, d)
    assert not os.path.exists(
        os.path.join(d, "model.safetensors.index.json"))
    cfg2, lp, _ = load_quantized(d)
    ids = jnp.asarray(synthetic_tokens(1, 8, cfg.vocab_size, 5))
    l1, _ = G.model_apply(cfg, qparams, ids)
    l2, _ = G.model_apply(cfg2, lp, ids)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


def test_hf_config_dict_all_arches():
    """The table-driven emitter produces a loadable config for every arch."""
    for arch in ("llama", "mistral", "qwen2", "mixtral", "baichuan", "gpt2",
                 "gpt_neox", "gptj", "phi", "falcon", "opt"):
        cfg = ModelConfig(arch=arch, vocab_size=256, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          max_position_embeddings=128)
        hf = hf_config_dict(cfg)
        assert hf["model_type"]
        assert hf.get("vocab_size") == 256


def test_resave_removes_stale_shards(tmp_path):
    """Re-saving into the same dir must not leave shards from a previous
    (larger or sharded) save behind."""
    import glob

    cfg, qparams, qcfg = _quantized_tiny()
    d = str(tmp_path / "ck")
    save_quantized(cfg, qparams, qcfg, d, max_shard_size="60KB")
    n1 = len(glob.glob(os.path.join(d, "model-*-of-*.safetensors")))
    assert n1 > 1
    save_quantized(cfg, qparams, qcfg, d, max_shard_size="90KB")
    files = sorted(os.path.basename(p) for p in
                   glob.glob(os.path.join(d, "model-*-of-*.safetensors")))
    with open(os.path.join(d, "model.safetensors.index.json")) as f:
        idx = json.load(f)
    assert set(files) == set(idx["weight_map"].values())
    save_quantized(cfg, qparams, qcfg, d)        # single-file re-save
    assert not glob.glob(os.path.join(d, "model-*-of-*.safetensors"))
    cfg2, lp, _ = load_quantized(d)
    assert cfg2.hidden_size == cfg.hidden_size
