"""Incoherence transforms: randomized-Hadamard / orthogonal factors, TPU-first.

Parity target: ``/root/reference/quant.py:26-89`` (get_hadK, matmul_hadU(t),
matmul_hadU_cuda). The canonical transform for dimension n = K * 2^e is the
orthogonal matrix

    U = (hadK ⊗ H_{2^e}) / sqrt(padN / K)

with H the Sylvester–Hadamard matrix (H[i,j] = (-1)^popcount(i&j)) and hadK
either a random orthogonal K x K factor (use_rand=True), a generated
Hadamard-table factor of order 4*odd (use_rand=False), or absent (K=1, pure
power of two, with zero-padding to padN when n is odd * 2^e and no table
factor exists). ``matmul_hadU(X) = X @ U^T`` applied along the last axis;
``matmul_hadUt(X) = X @ U``.

TPU-native evaluation: instead of the reference's log2(n) adjacent-pair
butterfly (quant.py:50-57) or a CUDA fast-hadamard kernel (N6), we evaluate
H_{2^e} = H_{2^a} ⊗ H_{2^b} as two small dense matmuls on a (..., 2^a, 2^b)
reshape — a provably identical linear map (the butterfly's state invariant
is s[l, m] = Σ_m' H_M[m, m'] x[l*M + m']) that runs entirely on the MXU with
no elementwise passes. Cost per token is O(n * (2^a + 2^b)) MACs ≈ n^1.5,
negligible against the codebook matmul, and XLA fuses the surrounding scale.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hadamard_tables import hadamard_matrix


def decompose_pow2(n: int) -> Tuple[int, int]:
    """n = odd_base * 2^exp -> (exp, odd_base)."""
    exp = 0
    while n % 2 == 0:
        n //= 2
        exp += 1
    return exp, n


def next_power_of_2(n: int) -> int:
    return 1 if n == 0 else 2 ** math.ceil(math.log2(n))


@lru_cache(maxsize=None)
def sylvester(e: int) -> np.ndarray:
    """Unnormalized Sylvester-Hadamard matrix of order 2^e (float32)."""
    H = np.ones((1, 1), dtype=np.float32)
    for _ in range(e):
        H = np.block([[H, H], [H, -H]])
    return H


def random_orthogonal(n: int, rng: np.random.Generator) -> np.ndarray:
    """Haar-random orthogonal matrix (QR of a Gaussian with sign fix) —
    the role of scipy special_ortho_group at ``quant.py:31``."""
    A = rng.standard_normal((n, n))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))[None, :]
    return Q.astype(np.float32)


@dataclass(frozen=True)
class HadSpec:
    """Description of the orthogonal factor for one dimension.

    Mirrors the reference's (hadK, K, padN) triple (``quant.py:26-39``):
      - hadK: the K x K leading factor (None when K == 1)
      - K:    size of the leading factor
      - padN: transform length (>= n; zero-pad when larger)
      - shards: when > 1, the transform is BLOCK-DIAGONAL,
        U = I_shards ⊗ U_sub with U_sub acting on padN/shards — the
        tensor-parallel refactor that makes each TP shard's incoherence
        factor local (solves the reference's README.md:84 limitation:
        "tensor-parallel is not supported because Hadamard transform cannot
        be done for sharded input"). hadK/K then describe U_sub.
    """
    hadK: Optional[np.ndarray]
    K: int
    padN: int
    shards: int = 1


def get_hadK(n: int, use_rand: bool = True,
             rng: Optional[np.random.Generator] = None,
             shards: int = 1) -> HadSpec:
    if shards > 1:
        assert n % shards == 0, (n, shards)
        sub = get_hadK(n // shards, use_rand=use_rand, rng=rng)
        assert sub.padN == n // shards
        return HadSpec(sub.hadK, sub.K, n, shards)
    exp, base = decompose_pow2(n)
    if base == 1:
        return HadSpec(None, 1, n)
    if use_rand:
        rng = rng if rng is not None else np.random.default_rng()
        return HadSpec(random_orthogonal(base, rng), base, n)
    # deterministic path: Hadamard-table factor of order base*4 needs exp>=2.
    # The table matrices are bit-identical to the reference asset (see
    # transforms/hadamard_tables.py) — mandatory, because use_rand=False
    # checkpoints recompute the factor at load time, so any other valid
    # Hadamard matrix would silently decode garbage from reference
    # checkpoints.
    tbl = hadamard_matrix(base * 4) if exp >= 2 else None
    if tbl is None:
        # exact reference behavior (quant.py:36-37): pad to the next power
        # of two with no leading factor — never substitute a different
        # orthogonal matrix
        return HadSpec(None, 1, next_power_of_2(n))
    return HadSpec((tbl / math.sqrt(base * 4)).astype(np.float32),
                   base * 4, n)


def _kron_split(e: int) -> Tuple[int, int]:
    # Keep the LOW factor at 128 lanes: H_{2^e} = H_{2^a} ⊗ H_{2^b} for any
    # a+b=e (identical linear map), but b=7 makes the (..., A, 128) reshape
    # a free view (minor dim stays vreg-native) and the B-contraction a
    # native 128-wide MXU dot — a 64x64 split relayouts on every reshape
    # (measured ~0.4 us per [64,64] reshape, ~10 of them per decode layer).
    b = min(e, 7)
    return e - b, b  # (high-bits factor, low-bits factor)


def hadamard_transform(X: jax.Array, scale: float | jax.Array = 1.0
                       ) -> jax.Array:
    """Unnormalized WHT along the last axis (length 2^e), times scale."""
    n = X.shape[-1]
    e = n.bit_length() - 1
    assert (1 << e) == n, f"hadamard_transform needs power-of-2 dim, got {n}"
    dt = X.dtype
    if e == 0:
        return X * scale
    ea, eb = _kron_split(e)
    A, B = 1 << ea, 1 << eb
    Hb = jnp.asarray(sylvester(eb), dtype=dt)
    if ea == 0:
        Y = jnp.einsum("...b,db->...d", X, Hb)
        return (Y * scale).reshape(X.shape)
    Ha = jnp.asarray(sylvester(ea), dtype=dt)
    Y = X.reshape(*X.shape[:-1], A, B)
    # y[a', b'] = sum_{a,b} Ha[a', a] Hb[b', b] x[a, b]
    Y = jnp.einsum("...ab,ca->...cb", Y, Ha)
    Y = jnp.einsum("...cb,db->...cd", Y, Hb)
    return (Y * scale).reshape(*X.shape[:-1], n)


def matmul_hadU(X: jax.Array, spec: HadSpec,
                scale: Optional[float | jax.Array] = None,
                transpose: bool = False) -> jax.Array:
    """Apply the canonical transform along the last axis: X @ U^T (or X @ U
    when transpose=True), with optional fused extra scale (the reference's
    wscale fusion, ``quant.py:72-84``). Pads X with zeros to spec.padN."""
    n = X.shape[-1]
    if n != spec.padN:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, spec.padN - n)]
        X = jnp.pad(X, pad)
    if spec.shards > 1:
        # block-diagonal: apply the sub-transform independently per shard
        # block — under GSPMD the reshape respects the TP shard boundary,
        # so no cross-device collective is emitted
        sub = HadSpec(spec.hadK, spec.K, spec.padN // spec.shards)
        Y = X.reshape(*X.shape[:-1], spec.shards, spec.padN // spec.shards)
        Y = matmul_hadU(Y, sub, scale=scale, transpose=transpose)
        return Y.reshape(*X.shape[:-1], spec.padN)
    had_scale = 1.0 / math.sqrt(spec.padN // spec.K)
    if scale is not None:
        had_scale = had_scale * scale
    if spec.K == 1:
        return hadamard_transform(X, had_scale)
    hadK = jnp.asarray(spec.hadK, dtype=X.dtype)
    if transpose:
        hadK = hadK.T
    M = spec.padN // spec.K
    Y = X.reshape(*X.shape[:-1], spec.K, M)
    Y = hadamard_transform(Y, had_scale)
    Y = jnp.einsum("...km,jk->...jm", Y, hadK)
    return Y.reshape(*X.shape[:-1], spec.padN)


def matmul_hadUt(X: jax.Array, spec: HadSpec,
                 scale: Optional[float | jax.Array] = None) -> jax.Array:
    return matmul_hadU(X, spec, scale=scale, transpose=True)


def full_U(spec: HadSpec) -> np.ndarray:
    """Materialize U (padN x padN) — for tests and small dims only."""
    e = decompose_pow2(spec.padN // spec.K)[0]
    H = sylvester(e)
    hadK = spec.hadK if spec.hadK is not None else np.ones((1, 1),
                                                           dtype=np.float32)
    return np.kron(hadK, H) / math.sqrt(spec.padN // spec.K)


def right_b_factor(spec: HadSpec) -> Optional[Tuple[np.ndarray, int]]:
    """(H_B * had_scale, B) — the lane-native low kron factor of the RIGHT
    transform, for fusing its contraction into the Pallas kernel epilogue
    (tile-local because B | TN and B | every segment's q_out). Returns None
    when the transform doesn't factor that way (shards, non-pow2 M).
    ``finish_right`` applies the remaining (cross-tile) factors."""
    if spec.shards > 1:
        return None
    M = spec.padN // spec.K
    if M < 8 or (M & (M - 1)) != 0:
        return None
    eb = min(M.bit_length() - 1, 7)
    B = 1 << eb
    return sylvester(eb) / math.sqrt(M), B


def finish_right(Y: jax.Array, spec: HadSpec,
                 hadK_stack: Optional[jax.Array] = None) -> jax.Array:
    """Complete a right transform whose B-side factor already ran in the
    kernel epilogue (right_b_factor): applies the high Sylvester factor
    H_A (if any) and the hadK leading factor (or a stacked per-segment
    hadK for fused groups). Y: (..., [nseg,] padN) b'-transformed."""
    M = spec.padN // spec.K
    e = M.bit_length() - 1
    eb = min(e, 7)
    ea = e - eb
    A, B = 1 << ea, 1 << eb
    dt = Y.dtype
    lead = Y.shape[:-1]
    Y = Y.reshape(*lead, spec.K, A, B)
    if ea > 0:
        Ha = jnp.asarray(sylvester(ea), dtype=dt)
        Y = jnp.einsum("...kab,ca->...kcb", Y, Ha)
    if hadK_stack is not None:
        # (..., s, K, A, B) × (s, K', K): per-segment leading factor
        Y = jnp.einsum("...skab,sjk->...sjab", Y, hadK_stack.astype(dt))
    elif spec.K > 1:
        hadK = jnp.asarray(spec.hadK, dtype=dt)
        Y = jnp.einsum("...kab,jk->...jab", Y, hadK)
    return Y.reshape(*lead, spec.padN)


def matmul_hadUt_grouped(X: jax.Array, spec: HadSpec, Gp: int,
                         scale: Optional[float | jax.Array] = None,
                         split: int = 1) -> Optional[jax.Array]:
    """``matmul_hadUt`` emitted directly in the Pallas kernel's grouped-
    permuted layout. With ``split == 1`` returns (m, 8*Gp) with

        out[:, i*Gp + g] = (X @ U)[:, 8*g + i]   for g < G = padN // 8
        out[:, i*Gp + g] = 0                     for g >= G (plane padding)

    so the fused decode+matmul kernel (ops/dequant_pallas.py) can consume
    it without the separate reshape/transpose x-permutation.

    ``split`` = P in {1, 2, 4} matches the kernel's subword decode
    (QFA_SPLIT_DECODE): the int32 word plane is bitcast to int(32/P)
    subwords, whose lane layout puts subword j of group g at lane P*g+j
    holding nibbles i = (8/P)*j + q. The matching x layout is

        out[:, q*(P*Gp) + P*g + j] = (X @ U)[:, 8*g + (8/P)*j + q]

    — position-plane-major (q), then group-major with the subword index
    minor, so each decoded packed plane dots against one contiguous x
    slice.

    The permutation is FREE inside the transform: the Sylvester factor
    H_B satisfies H_B[pi(x), pi(y)] = H_B[x, y] for any permutation pi of
    bit positions (popcount(x & y) is bit-permutation invariant), so
    re-ordering the OUTPUT coefficients of the B-axis contraction is just
    a row permutation of the constant H_B matrix, precomputed on host.

    Returns None when the shape doesn't admit the fused form
    (power-of-2 part < 8); callers fall back to matmul_hadUt + an
    explicit permutation.
    """
    n = X.shape[-1]
    s, K = spec.shards, spec.K
    L = spec.padN // s
    M = L // K
    if M < 8 or (M & (M - 1)) != 0 or spec.padN % 8 != 0:
        return None
    if n != spec.padN:
        X = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, spec.padN - n)])
    assert X.ndim == 2, "grouped prologue expects (m, n) input"
    assert split in (1, 2, 4), split
    m = X.shape[0]
    G = spec.padN // 8
    e = M.bit_length() - 1
    eb = min(e, 7)          # lane-native low factor (see _kron_split)
    ea = e - eb
    A, B = 1 << ea, 1 << eb
    dt = X.dtype
    had_scale = 1.0 / math.sqrt(M)
    if scale is not None:
        had_scale = had_scale * scale
    P, nq = split, 8 // split
    HB = sylvester(eb)
    C = B // 8
    # sigma maps output lane l = q*(B*P//8) + c*P + j to coefficient
    # b' = c*8 + (8//P)*j + q  (P == 1 reduces to l = i*C + c, b' = c*8+i)
    ll = np.arange(B)
    qq, r = np.divmod(ll, B * P // 8)
    cc, jj = np.divmod(r, P)
    sigma = cc * 8 + nq * jj + qq
    HBp = jnp.asarray(HB[sigma] * had_scale, dtype=dt)     # (B, B) rows
    Ha = jnp.asarray(sylvester(ea), dtype=dt)
    Y = X.reshape(m, s, K, A, B)
    if ea > 0:
        Y = jnp.einsum("mskab,xa->mskxb", Y, Ha)
    Y = jnp.einsum("mskxb,lb->mskxl", Y, HBp)
    if K > 1:
        hadK = jnp.asarray(spec.hadK, dtype=dt)
        # hadUt: contract with hadK (not transposed): out_j = sum_k Y_k H_kj
        Y = jnp.einsum("mskxl,kj->msjxl", Y, hadK)
    # split l = (q, c, j): move q out, keep (s,K,A,c) group-major with j
    # minor: (m, s, K, A, nq, C*P) -> (m, nq, G, P)
    Y = Y.reshape(m, s, K, A, nq, C * P)
    Y = jnp.moveaxis(Y, 4, 1).reshape(m, nq, G, P)
    if Gp != G:
        Y = jnp.pad(Y, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    return Y.reshape(m, 8 * Gp)
