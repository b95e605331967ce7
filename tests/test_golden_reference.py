"""Golden-fixture reference-checkpoint interop (VERDICT r4 #5).

tests/golden/<codebook>/ holds tiny checkpoints in the reference stack's
EXACT on-disk schema, produced by tools/make_golden_fixture.py — an
independent numpy implementation that follows the reference packing and
forward code line-by-line (qlinear.py:44-57, codebook maybe_pack_idxs,
quant.py butterfly Hadamard). Loading them through the public
load_quantized API and matching the committed full linear maps proves
bit-compatibility with reference checkpoints, not merely that our packer
inverts itself.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CODEBOOKS = ["e8p12", "d4", "hi", "e8p12rvq3b", "e8p12rvq4b"]


@pytest.fixture(scope="module")
def loads():
    from quip_for_all_tpu.utils.checkpoint import load_quantized
    out = {}
    for cb in CODEBOOKS:
        out[cb] = load_quantized(os.path.join(GOLDEN, cb),
                                 dtype=jnp.float32)
    return out


@pytest.mark.fast
@pytest.mark.parametrize("cb", CODEBOOKS)
def test_golden_layer_maps_match(cb, loads):
    """Our loader + forward must reproduce the committed full linear maps
    (q_proj: 128->128; down_proj: 256->128 — covers both transform
    dims and the packed-idx edge cases)."""
    from quip_for_all_tpu.nn import qlinear as QL
    cfg, params, qcfg = loads[cb]
    exp = np.load(os.path.join(GOLDEN, cb, "expected.npz"))
    blk = params["layers"][0]
    for role, lin in (("q_proj", blk["self_attn"]["q_proj"]),
                      ("down_proj", blk["mlp"]["down_proj"])):
        n = lin.in_features
        got = np.asarray(QL.apply(lin, jnp.eye(n, dtype=jnp.float32),
                                  compute_dtype=jnp.float32))
        want = exp[role]
        rel = (np.abs(got - want).max()
               / (np.abs(want).max() + 1e-9))
        # f32 runtime vs the fixture's f64 reference: residual-codebook
        # rs-scaled sums land ~7e-5; a packing error would be O(1)
        assert rel < 2e-4, (cb, role, rel)


@pytest.mark.fast
def test_golden_generate_runs(loads):
    import quip_for_all_tpu as qfa
    cfg, params, qcfg = loads["e8p12"]
    out = qfa.generate(cfg, params, jnp.asarray([[1, 2, 3]]), 6,
                       cache_len=32, dtype_str="float32")
    assert np.asarray(out).shape == (1, 9)


@pytest.mark.fast
@pytest.mark.parametrize("cb", CODEBOOKS)
def test_golden_roundtrip_repack(cb, loads):
    """Save our loaded model back out and reload: Qidxs must round-trip
    bit-exactly through our packer (the inverse direction of interop)."""
    from safetensors.numpy import safe_open

    from quip_for_all_tpu.ops.qtensor import to_checkpoint_idxs
    cfg, params, qcfg = loads[cb]
    lin = params["layers"][0]["self_attn"]["q_proj"]
    ours = to_checkpoint_idxs(lin.qweight)
    with safe_open(os.path.join(GOLDEN, cb, "model.safetensors"),
                   framework="numpy") as f:
        theirs = f.get_tensor("model.layers.0.self_attn.q_proj.Qidxs")
    assert ours.dtype == theirs.dtype, (cb, ours.dtype, theirs.dtype)
    assert np.array_equal(ours, theirs), cb
