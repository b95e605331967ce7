"""Generate tests/golden/<codebook>/ — tiny checkpoints in the REFERENCE
stack's exact on-disk schema (VERDICT r4 #5), built by following the
reference code line-by-line with numpy only:

  - Qidxs packed per /root/reference/qlinear.py:44-57 +
    codebook.maybe_pack_idxs (/root/reference/codebook/hi.py:41-50
    interleaved nibbles, e8p12_rvq3.py:102-107 24-bit repack, int16 view
    for E8P12, uint8 for D4, int32 main<<16|resid for RVQ4B)
  - state-dict names as accelerate.save_model writes them for a HF llama
    (model.layers.0.self_attn.q_proj.Qidxs, ..., incl. the fake scalar
    `weight` buffer, qlinear.py:76-78)
  - config.json + quantization_config.json per quantizer.py:132-147,754-756
  - expected_q_proj.npy / expected_down_proj.npy: the layer's FULL linear
    map y = f(x) columns, computed with an INDEPENDENT butterfly
    Walsh-Hadamard (quant.py:50-65) and the documented forward order
    (qlinear.py:87-115): x*SU -> hadUt*wscale -> x @ W_hat^T -> hadU ->
    slice -> *SV.

The only shared ingredient with the runtime under test is the codebook
GRID (codebooks/*.py), whose construction is itself pinned by
tests/test_codebooks.py against the documented lattice properties.

Deterministic (seeded); small (~100KB per codebook). Rerun to regenerate.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from quip_for_all_tpu.codebooks import e8p12, e8p12_rvq3  # noqa: E402
from quip_for_all_tpu.codebooks.d4 import d4_grid  # noqa: E402

OUT_ROOT = os.path.join(ROOT, "tests", "golden")

D, I, V, HEADS, LAYERS = 128, 256, 128, 4, 1


def butterfly_hadamard(X: np.ndarray) -> np.ndarray:
    """matmul_hadU for K == 1 (reference quant.py:42-65): adjacent-pair
    butterfly to X @ H / sqrt(n). H is symmetric, so this is also
    matmul_hadUt."""
    n = X.shape[-1]
    inp = X.astype(np.float64).copy().reshape(-1, n, 1)
    out = inp.copy()
    while inp.shape[1] > 1:
        inp = inp.reshape(inp.shape[0], inp.shape[1] // 2, 2, inp.shape[2])
        out = out.reshape(inp.shape)
        out[:, :, 0, :] = inp[:, :, 0, :] + inp[:, :, 1, :]
        out[:, :, 1, :] = inp[:, :, 0, :] - inp[:, :, 1, :]
        out = out.reshape(inp.shape[0], inp.shape[1], -1)
        inp, out = out, inp
    return (inp.reshape(X.shape) / np.sqrt(n)).astype(np.float64)


# ------------------------------------------------ per-codebook raw + pack

def rand_raw(cb_name: str, rng, out_f: int, in_f: int) -> np.ndarray:
    G8, G4, G1 = in_f // 8, in_f // 4, in_f
    if cb_name == "E8P12":
        return rng.integers(0, 1 << 16, (out_f, G8), dtype=np.uint16)
    if cb_name == "D4":
        return rng.integers(0, 256, (out_f, G4), dtype=np.uint8)
    if cb_name == "HI":
        return rng.integers(0, 16, (out_f, G1), dtype=np.int64)
    if cb_name == "E8P12RVQ3B":
        main = rng.integers(0, 1 << 16, (out_f, G8), dtype=np.int64)
        resid = rng.integers(0, 256, (out_f, G8), dtype=np.int64)
        return ((main << 8) | resid).astype(np.int64)
    if cb_name == "E8P12RVQ4B":
        main = rng.integers(0, 1 << 16, (out_f, G8), dtype=np.int64)
        resid = rng.integers(0, 1 << 16, (out_f, G8), dtype=np.int64)
        return ((main << 16) | resid).astype(np.int64)
    raise ValueError(cb_name)


def pack(cb_name: str, raw: np.ndarray) -> np.ndarray:
    """reference maybe_pack_idxs + idx_dtype storage."""
    if cb_name == "E8P12":
        return raw.astype(np.uint16).view(np.int16)
    if cb_name == "D4":
        return raw.astype(np.uint8)
    if cb_name == "HI":
        p = 8
        w = np.zeros((raw.shape[0], raw.shape[1] // 8), dtype=np.int64)
        # interleave order 0,2,4,6,1,3,5,7 (hi.py:41-50)
        for j, col in enumerate((0, 2, 4, 6, 1, 3, 5, 7)):
            w += raw[:, col::p] << (4 * j)
        return w.astype(np.uint32).view(np.int32)
    if cb_name == "E8P12RVQ3B":
        # int32 little-endian bytes, keep low 3 of each 4
        # (e8p12_rvq3.py:102-107)
        i32 = raw.astype(np.uint32).view(np.int32)
        i8 = i32.view(np.int8).reshape(i32.shape[0], i32.shape[1], 4)
        return (i8[..., :3].reshape(i32.shape[0], -1)
                .copy().view(np.int32))
    if cb_name == "E8P12RVQ4B":
        return raw.astype(np.uint32).view(np.int32)
    raise ValueError(cb_name)


def decode_dense(cb_name: str, raw: np.ndarray, out_f: int,
                 in_f: int) -> np.ndarray:
    """Raw codes -> W_hat (out_f, in_f) actual lattice values."""
    if cb_name == "E8P12":
        return e8p12.full_grid()[raw.astype(np.int64)].reshape(out_f, in_f)
    if cb_name == "D4":
        return d4_grid()[raw.astype(np.int64)].reshape(out_f, in_f)
    if cb_name == "HI":
        return (raw.astype(np.float64) - 7.5).reshape(out_f, in_f)
    if cb_name == "E8P12RVQ3B":
        rs = 1 / 2.04
        main = e8p12.full_grid()[(raw >> 8).astype(np.int64)]
        resid = e8p12_rvq3.e81b_grid()[(raw & 0xFF).astype(np.int64)]
        return (main + rs * resid).reshape(out_f, in_f)
    if cb_name == "E8P12RVQ4B":
        rs = 1 / 3.45
        main = e8p12.full_grid()[(raw >> 16).astype(np.int64)]
        resid = e8p12.full_grid()[(raw & 0xFFFF).astype(np.int64)]
        return (main + rs * resid).reshape(out_f, in_f)
    raise ValueError(cb_name)


def full_map(W_hat, SU, SV, wscale, out_f):
    """Independent reference-forward linear map: rows = basis outputs.
    Returns M (in_f, out_f) with y = x @ M for row-vector x."""
    X = np.eye(SU.shape[0], dtype=np.float64)
    z = butterfly_hadamard(X * SU[None, :]) * wscale
    y = z @ W_hat.astype(np.float64).T
    y = butterfly_hadamard(y)[:, :out_f]
    return (y * SV[None, :]).astype(np.float32)


IDX_DTYPE = {"E8P12": "torch.int16", "D4": "torch.uint8",
             "HI": "torch.int32", "E8P12RVQ3B": "torch.int32",
             "E8P12RVQ4B": "torch.int32"}
CODESZ = {"E8P12": 8, "D4": 4, "HI": 1, "E8P12RVQ3B": 8, "E8P12RVQ4B": 8}
ORS = {"E8P12RVQ3B": 1 / 2.04, "E8P12RVQ4B": 1 / 3.45}


def build_one(cb_name: str) -> None:
    from safetensors.numpy import save_file
    import zlib
    rng = np.random.default_rng(zlib.crc32(cb_name.encode()))
    t: dict = {}
    expected = {}

    def add_linear(name, in_f, out_f):
        raw = rand_raw(cb_name, rng, out_f, in_f)
        su = np.sign(rng.standard_normal(in_f)).astype(np.float32)
        sv = np.sign(rng.standard_normal(out_f)).astype(np.float32)
        wscale = float(rng.uniform(0.005, 0.02))
        t[name + ".Qidxs"] = pack(cb_name, raw)
        t[name + ".SU"] = su.astype(np.float16)
        t[name + ".SV"] = sv.astype(np.float16)
        t[name + ".Wscale"] = np.asarray(wscale, dtype=np.float32)
        t[name + ".weight"] = np.zeros((), dtype=np.float16)  # fake buffer
        W_hat = decode_dense(cb_name, raw, out_f, in_f)
        return full_map(W_hat, su, sv, wscale, out_f)

    p = "model.layers.0"
    for role, in_f, out_f in (("self_attn.q_proj", D, D),
                              ("self_attn.k_proj", D, D),
                              ("self_attn.v_proj", D, D),
                              ("self_attn.o_proj", D, D),
                              ("mlp.gate_proj", D, I),
                              ("mlp.up_proj", D, I),
                              ("mlp.down_proj", I, D)):
        m = add_linear(f"{p}.{role}", in_f, out_f)
        if role in ("self_attn.q_proj", "mlp.down_proj"):
            expected[role.split(".")[-1]] = m

    t[f"{p}.input_layernorm.weight"] = np.ones(D, dtype=np.float16)
    t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float16)
    t["model.norm.weight"] = np.ones(D, dtype=np.float16)
    t["model.embed_tokens.weight"] = (
        rng.standard_normal((V, D)).astype(np.float16) * 0.02)
    t["lm_head.weight"] = (
        rng.standard_normal((V, D)).astype(np.float16) * 0.02)

    d = os.path.join(OUT_ROOT, cb_name.lower())
    os.makedirs(d, exist_ok=True)
    save_file(t, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": V, "hidden_size": D,
            "intermediate_size": I, "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS, "num_key_value_heads": HEADS,
            "max_position_embeddings": 256, "rms_norm_eps": 1e-5,
            "torch_dtype": "float16",
        }, f, indent=1)
    qdict = {
        "quant_method": "QUiP",
        "rescale_WH": False,
        "use_rand": False,
        "codebook": cb_name,
        "codesz": CODESZ[cb_name],
        "idx_dtype": IDX_DTYPE[cb_name],
        "merge_suv": False,
        "per_channel": False,
        "opt_resid_scale": ORS.get(cb_name, -1),
        "modules_to_not_convert": ["lm_head"],
    }
    with open(os.path.join(d, "quantization_config.json"), "w") as f:
        json.dump(qdict, f, indent=2)
    np.savez_compressed(os.path.join(d, "expected.npz"),
                        q_proj=expected["q_proj"],
                        down_proj=expected["down_proj"])
    size = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
    print(f"{cb_name}: wrote {d} ({size / 1024:.0f} KB)")


if __name__ == "__main__":
    for cb in ("E8P12", "D4", "HI", "E8P12RVQ3B", "E8P12RVQ4B"):
        build_one(cb)
