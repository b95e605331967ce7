"""matmul_hadUt_grouped: the grouped-permuted left transform must equal
matmul_hadUt followed by the kernel's explicit x-permutation, across
power-of-2 / hadK-factor / block-diagonal-sharded / padded shapes."""
import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.transforms.incoherence import (
    get_hadK, matmul_hadUt, matmul_hadUt_grouped)


def _reference_grouped(x, spec, Gp, scale=None):
    y = np.asarray(matmul_hadUt(jnp.asarray(x), spec, scale=scale))
    m, padN = y.shape
    G = padN // 8
    perm = y.reshape(m, G, 8).transpose(0, 2, 1)        # (m, 8, G)
    if Gp != G:
        perm = np.pad(perm, ((0, 0), (0, 0), (0, Gp - G)))
    return perm.reshape(m, 8 * Gp)


@pytest.mark.parametrize("n,shards", [
    (64, 1),            # pure power of two
    (256, 1),
    (96, 1),            # K=3 table/random factor
    (1376, 1),          # K=43, M=32 (the 11008/8 shape class)
    (256, 2),           # block-diagonal TP transform
    (512, 4),
])
def test_grouped_matches_explicit_permutation(n, shards, rng):
    spec = get_hadK(n, use_rand=True, rng=rng, shards=shards)
    x = rng.standard_normal((3, n)).astype(np.float32)
    G = spec.padN // 8
    for Gp in (G, -(-G // 128) * 128):
        got = matmul_hadUt_grouped(jnp.asarray(x), spec, Gp, scale=0.37)
        assert got is not None
        want = _reference_grouped(x, spec, Gp, scale=0.37)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)


def test_grouped_rejects_tiny_pow2(rng):
    spec = get_hadK(12, use_rand=True, rng=rng)   # M = 4 < 8
    out = matmul_hadUt_grouped(jnp.asarray(np.ones((1, 12), np.float32)),
                               spec, 2)
    assert out is None


def test_grouped_pads_short_input(rng):
    # n < padN inputs get zero-padded exactly like matmul_hadUt
    spec = get_hadK(64, use_rand=True, rng=rng)
    x = rng.standard_normal((2, 60)).astype(np.float32)
    got = matmul_hadUt_grouped(jnp.asarray(x), spec, 8)
    xp = np.pad(x, ((0, 0), (0, 4)))
    want = _reference_grouped(xp, spec, 8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=2e-5)
