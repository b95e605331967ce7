"""Codebook construction + quantize/pack/decode round-trip tests.

Grid-property assertions come from the reference docstrings
(``codebook/d4.py:2-16``, ``codebook/e8p12.py:2-9``); oracle tests compare
our numpy grids against the reference's torch-CPU builders when
/root/reference is present (SURVEY.md §4 test strategy).
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from quip_for_all_tpu.codebooks import (
    D4, E8P12, E8P12RVQ3B, E8P12RVQ4B, HI4B1C, codebook_id, get_codebook)
from quip_for_all_tpu.codebooks import d4 as d4_mod
from quip_for_all_tpu.codebooks import e8p12 as e8p_mod
from quip_for_all_tpu.codebooks import e8p12_rvq3 as rvq3_mod

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "codebook"))


# ---------------------------------------------------------------- properties

def test_d4_grid_properties():
    g = d4_mod.d4_grid()
    assert g.shape == (256, 4)
    # half-integer components, even sum, norm^2 <= 9
    assert np.all(np.abs(g * 2 - np.round(g * 2)) < 1e-6)
    assert np.all(np.round(g.sum(-1)).astype(int) % 2 == 0)
    assert np.all((g ** 2).sum(-1) <= 9 + 1e-6)
    # distinct codewords
    assert len({tuple(r) for r in g.tolist()}) == 256
    # distribution by sorted abs pattern (docstring d4.py:8-16)
    pats = {}
    for r in g:
        key = tuple(sorted(np.abs(r)))
        pats[key] = pats.get(key, 0) + 1
    counts = sorted(pats.values())
    assert sorted([8, 8, 48, 32, 32, 32, 96]) == counts


def test_e8p_abs_grid():
    a = e8p_mod.abs_grid_raw()
    assert a.shape == (256, 8)
    assert np.all((a[:227] ** 2).sum(-1) <= 10 + 1e-6)
    assert np.allclose((a[227:] ** 2).sum(-1), 12.0)


def test_e8p_full_grid_properties():
    g = e8p_mod.full_grid()
    assert g.shape == (1 << 16, 8)
    # every codeword is in E8 + 1/4: after subtracting the global 1/4 shift
    # (sign depends on parity), coordinates are in D8 or D8 + 1/2 with even sum
    shifted = g - 0.25  # entries become integer or half-integer multiples
    q = shifted * 2
    assert np.all(np.abs(q - np.round(q)) < 1e-4)
    # distinct codewords
    assert len({tuple(r) for r in g[:4096].tolist()}) == 4096


def test_e81b_grid_properties():
    g = rvq3_mod.e81b_grid()
    assert g.shape == (256, 8)
    norms = (g ** 2).sum(-1)
    assert np.all(norms[:241] <= 2 + 1e-6)
    assert np.allclose(norms[241:], 4.0)
    assert len({tuple(r) for r in g.tolist()}) == 256


def test_hi_grid():
    g = HI4B1C().grid()
    assert g.shape == (16, 1)
    assert np.allclose(g[:, 0], np.arange(-8, 8) + 0.5)


# ---------------------------------------------------------------- round-trip

@pytest.mark.parametrize("name", list(codebook_id))
def test_quantize_pack_decode_roundtrip(name, rng):
    cb = get_codebook(name)
    m, groups = 16, 8
    n = cb.codesz * groups
    X = rng.standard_normal((m * groups, cb.codesz)).astype(np.float32)
    vals, idx = cb.quantize(jnp.asarray(X))
    vals, idx = np.asarray(vals), np.asarray(idx)
    # quantize returns actual codewords of the returned indices
    dec = np.asarray(cb.decode(jnp.asarray(idx.reshape(m, groups))))
    assert np.allclose(dec.reshape(-1, cb.codesz), vals, atol=1e-5)
    # pack -> checkpoint dtype -> unpack is the identity on raw indices
    raw = idx.reshape(m, groups)
    packed = cb.pack_idxs(raw)
    assert packed.dtype == cb.idx_dtype
    unpacked = cb.unpack_idxs(packed)
    assert np.array_equal(unpacked, raw)


@pytest.mark.parametrize("name", list(codebook_id))
def test_quantize_is_nearest(name, rng):
    """Returned codeword must be the true argmin over the full grid."""
    cb = get_codebook(name)
    X = (0.7 * rng.standard_normal((64, cb.codesz))).astype(np.float32)
    vals, _ = cb.quantize(jnp.asarray(X))
    vals = np.asarray(vals)
    err = ((X - vals) ** 2).sum(-1)
    if name.startswith("E8P12RVQ"):
        # two-stage RVQ: check each stage separately via the main grid
        g = cb.grid()
        d = ((X[:, None, :] - g[None, :, :]) ** 2).sum(-1).min(-1)
        # final error must beat main-stage-only error
        assert np.all(err <= d + 1e-5)
    else:
        g = cb.grid()
        d = ((X[:, None, :] - g[None, :, :]) ** 2).sum(-1).min(-1)
        assert np.allclose(err, d, atol=1e-5)


def test_rvq4_resid_improves(rng):
    cb = E8P12RVQ4B()
    e8 = E8P12()
    X = (0.8 * rng.standard_normal((128, 8))).astype(np.float32)
    v4, _ = cb.quantize(jnp.asarray(X))
    v2, _ = e8.quantize(jnp.asarray(X))
    err4 = float(((jnp.asarray(X) - v4) ** 2).sum())
    err2 = float(((jnp.asarray(X) - v2) ** 2).sum())
    assert err4 < err2 * 0.5


# ---------------------------------------------------------------- oracle

@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestAgainstReference:
    @pytest.fixture(autouse=True)
    def _ref_path(self):
        sys.path.insert(0, REF)
        yield
        sys.path.remove(REF)

    def test_d4_grid_matches(self):
        from codebook.d4 import build_D4_CB
        ref = build_D4_CB().numpy()
        assert np.allclose(d4_mod.d4_grid(), ref)

    def test_e8p_packed_abs_matches(self):
        from codebook.e8p12 import get_packed_abs_grid
        ref = get_packed_abs_grid().numpy()
        assert np.array_equal(e8p_mod.packed_abs_grid(), ref)

    def test_e8p_full_grid_matches(self):
        # The reference's get_full_grid crashes on numpy>=2 (np.int8 overflow
        # at codebook/e8p12.py:96), so decode the REFERENCE's packed int64
        # grid here with independent arithmetic and compare to our full grid.
        from codebook.e8p12 import get_packed_abs_grid
        ref_packed = get_packed_abs_grid().numpy()  # (256,) int64
        shuffle = [0, 2, 1, 3, 4, 6, 5, 7]
        c = np.arange(1 << 16, dtype=np.int64)
        signs, abs_idx = c & 255, c >> 8
        parity = np.zeros_like(signs)
        for i in range(8):
            parity ^= (signs >> i) & 1
        signs = signs ^ parity
        expect = np.zeros((1 << 16, 8), dtype=np.float64)
        for i in range(8):
            ii = shuffle[i]
            byte = (ref_packed[abs_idx] >> (8 * ii)) & 255
            val = np.where(byte >= 128, byte - 256, byte) / 4.0
            bit = (signs >> (7 - ii)) & 1
            expect[:, i] = np.where(bit == 1, -val, val)
        expect += np.where(parity == 1, -0.25, 0.25)[:, None]
        assert np.allclose(e8p_mod.full_grid(), expect)

    def test_e81b_grid_matches(self):
        from codebook.e8p12_rvq3 import get_e81bgrid, pack_e81b
        ref = get_e81bgrid()
        assert np.allclose(rvq3_mod.e81b_grid(), ref.numpy())
        ref_packed = pack_e81b(ref).numpy()
        assert np.array_equal(rvq3_mod.e81b_grid_packed(), ref_packed)

    def test_hi_pack_matches(self, rng):
        import torch
        from codebook.hi import HI4B1C_codebook
        ref_cb = HI4B1C_codebook()
        idxs = rng.integers(0, 16, size=(8, 32)).astype(np.int64)
        ref_packed = ref_cb.maybe_pack_idxs(
            torch.from_numpy(idxs).to(torch.int32)).numpy()
        ours = HI4B1C().pack_idxs(idxs.astype(np.int32))
        assert np.array_equal(ours, ref_packed)

    def test_rvq3_pack_matches(self, rng):
        import torch
        from codebook.e8p12_rvq3 import E8P12RVQ3B_codebook
        ref_cb = E8P12RVQ3B_codebook(inference=True)
        idxs = rng.integers(0, 1 << 24, size=(8, 32)).astype(np.int64)
        ref_packed = ref_cb.maybe_pack_idxs(
            torch.from_numpy(idxs).to(torch.int32)).numpy()
        ours = E8P12RVQ3B().pack_idxs(idxs.astype(np.int32))
        assert np.array_equal(ours, ref_packed)
