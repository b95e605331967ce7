"""Hadamard table + incoherence transform tests (SURVEY.md §4: orthogonality,
H^T H = I, and oracle equality against the reference's pure-torch butterfly).
"""
import math
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.transforms.hadamard_tables import (
    available, generated_hadamard_matrix, hadamard_matrix)
from quip_for_all_tpu.transforms.incoherence import (
    HadSpec, full_U, get_hadK, hadamard_transform, matmul_hadU, matmul_hadUt,
    next_power_of_2, sylvester)

REF = "/root/reference"
HAS_REF = os.path.isfile(os.path.join(REF, "quant.py"))

# orders needing Williamson-type constructions: only served from the
# embedded table, not generated
GENERATION_GAPS = {92, 116, 156, 172, 188, 236}


def test_all_reference_orders_available():
    """Every order the reference asset ships exists and is a valid H."""
    for n in [1, 2, 4] + list(range(12, 253, 8)):
        H = hadamard_matrix(n)
        assert H is not None, f"order {n} missing"
        assert np.all(np.abs(H) == 1)
        assert np.allclose(H @ H.T, n * np.eye(n))


def test_generated_hadamard_orders():
    covered = []
    for n in range(12, 253, 8):
        H = generated_hadamard_matrix(n)
        if H is None:
            assert n in GENERATION_GAPS, f"order {n} unexpectedly missing"
            continue
        covered.append(n)
        assert np.all(np.abs(H) == 1)
        assert np.allclose(H @ H.T, n * np.eye(n))
    assert len(covered) == 31 - len(GENERATION_GAPS)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_oracle_hadamard_asset_bit_identical():
    """hadamard_matrix reproduces the reference asset EXACTLY for every
    order it ships — required for use_rand=False checkpoint interop
    (the factor is recomputed from the table at load, quant.py:36-39)."""
    from safetensors import safe_open
    with safe_open(os.path.join(REF, "hadamard.safetensors"), "np") as f:
        for key in f.keys():
            n = int(key)
            ref = f.get_tensor(key)
            ours = hadamard_matrix(n)
            assert ours is not None, f"order {n} missing"
            assert np.array_equal(ours.astype(np.float32), ref), \
                f"order {n} differs from reference asset"


def test_use_rand_false_pads_like_reference():
    """Orders outside the table pad to the next power of two with K=1 —
    the reference's exact fallback (quant.py:34-37), never a silent
    orthogonal substitution."""
    for n in [372 * 4, 3, 6]:  # base*4 > 252; exp < 2 cases
        spec = get_hadK(n, use_rand=False)
        assert spec.hadK is None and spec.K == 1
        assert spec.padN == next_power_of_2(n)
    # in-table order: exact factor, no padding
    spec = get_hadK(172 * 64, use_rand=False)
    assert spec.K == 172 and spec.padN == 172 * 64


@pytest.mark.parametrize("e", [0, 1, 3, 5, 8])
def test_sylvester(e):
    H = sylvester(e)
    n = 1 << e
    i, j = np.indices((n, n))
    expect = (-1.0) ** np.vectorize(lambda a, b: bin(a & b).count("1"))(i, j)
    assert np.array_equal(H, expect)


@pytest.mark.parametrize("n", [64, 96, 44, 352, 11008 // 16])
def test_matmul_hadU_is_orthogonal(n, rng):
    spec = get_hadK(n, use_rand=True, rng=rng)
    X = rng.standard_normal((4, n)).astype(np.float32)
    Y = np.asarray(matmul_hadU(jnp.asarray(X), spec))
    # orthogonal: norms preserved
    assert np.allclose((Y ** 2).sum(-1), (X ** 2).sum(-1), rtol=1e-4)
    # hadUt inverts hadU
    Xr = np.asarray(matmul_hadUt(jnp.asarray(Y), spec))
    assert np.allclose(Xr, X, atol=1e-4)


@pytest.mark.parametrize("n,use_rand", [(64, True), (176, False), (48, False),
                                        (96, True)])
def test_matmul_hadU_equals_dense(n, use_rand, rng):
    spec = get_hadK(n, use_rand=use_rand, rng=rng)
    U = full_U(spec)
    assert np.allclose(U @ U.T, np.eye(spec.padN), atol=1e-5)
    X = rng.standard_normal((3, n)).astype(np.float32)
    Y = np.asarray(matmul_hadU(jnp.asarray(X), spec))
    assert np.allclose(Y, X @ U.T, atol=1e-4)
    Yt = np.asarray(matmul_hadUt(jnp.asarray(X), spec))
    assert np.allclose(Yt, X @ U, atol=1e-4)


def test_fused_scale(rng):
    spec = get_hadK(128)
    X = rng.standard_normal((2, 128)).astype(np.float32)
    Y1 = np.asarray(matmul_hadU(jnp.asarray(X), spec, scale=0.37))
    Y2 = 0.37 * np.asarray(matmul_hadU(jnp.asarray(X), spec))
    assert np.allclose(Y1, Y2, rtol=1e-5)


def test_hadamard_transform_matches_matrix(rng):
    X = rng.standard_normal((5, 256)).astype(np.float32)
    H = sylvester(8)
    Y = np.asarray(hadamard_transform(jnp.asarray(X)))
    assert np.allclose(Y, X @ H.T, atol=1e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
def test_oracle_matmul_hadU(rng):
    """Bit-compatibility with the reference butterfly (quant.py:42-65)."""
    import torch
    cwd = os.getcwd()
    sys.path.insert(0, REF)
    os.chdir(REF)  # reference loads hadamard.safetensors relatively
    try:
        import quant as ref_quant
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    for n, use_rand in [(64, True), (96, True), (176, False), (256, False)]:
        spec = get_hadK(n, use_rand=use_rand, rng=rng)
        # feed OUR hadK into the reference implementation so both sides use
        # the same factor
        ref_hadK = (torch.from_numpy(spec.hadK)
                    if spec.hadK is not None else None)
        X = rng.standard_normal((4, n)).astype(np.float32)
        ref_out = ref_quant.matmul_hadU(torch.from_numpy(X), ref_hadK,
                                        spec.K, spec.padN).numpy()
        ours = np.asarray(matmul_hadU(jnp.asarray(X), spec))
        assert np.allclose(ours, ref_out, atol=1e-4), (n, use_rand)
        ref_out_t = ref_quant.matmul_hadUt(torch.from_numpy(X), ref_hadK,
                                           spec.K, spec.padN).numpy()
        ours_t = np.asarray(matmul_hadUt(jnp.asarray(X), spec))
        assert np.allclose(ours_t, ref_out_t, atol=1e-4), (n, use_rand)
