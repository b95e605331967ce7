"""LDLQ: adaptive lattice rounding driven by the Hessian's block-LDL factor.

Parity target: ``/root/reference/quant.py:91-230`` (block_LDL, LDLQ,
LDLQ_buffered). The reference's right-to-left column sweep maps to a
``jax.lax.scan`` whose carry is the error matrix E = Wr - hatWr (with
not-yet-quantized columns holding Wr): because the block-LDL factor L has
unit diagonal blocks and is block-lower-triangular, the reference's

    WXWX_k = Wr[:,k] + (Wr - hatWr)[:, k+1:] @ L[k+1:, k]

equals simply E @ L[:, k] under that carry convention — one clean MXU
matmul per step with static shapes, no triangular slicing.

All matmuls run with float32 accumulation (``precision='highest'``): on TPU
the default f32 matmul precision is bf16-grade, which is not acceptable for
quantization-time numerics.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codebooks import Codebook

_PREC = jax.lax.Precision.HIGHEST


def block_ldl(L_chol: jax.Array, g: int) -> jax.Array:
    """Cholesky factor -> block-unit-lower-triangular L (parity:
    ``quant.py:91-103``): each block column is right-multiplied by the
    inverse of its diagonal gxg block."""
    n = L_chol.shape[0]
    assert n % g == 0
    m = n // g
    blocks = L_chol.reshape(m, g, m, g)
    diag = jnp.einsum("igih->igh", blocks)          # (m, g, g)
    diag_inv = jnp.linalg.inv(diag)
    L = jnp.einsum("nmg,mgh->nmh", L_chol.reshape(n, m, g), diag_inv,
                   precision=_PREC)
    return L.reshape(n, n)


@partial(jax.jit, static_argnames=("cb", "quip_tune_iters"))
def ldlq(Wr: jax.Array, Hr: jax.Array, L_chol: jax.Array, cb: Codebook,
         quip_tune_iters: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Quantize Wr (m, n) against Hessian Hr using its Cholesky factor.

    Returns (hatWr (m, n) float32, Qidxs (m, n/codesz) int32 raw codes).
    """
    m, n = Wr.shape
    g = cb.codesz
    nb = n // g
    L = block_ldl(L_chol, g)                         # (n, n)
    # per-step slices of L's block columns, scan order: k = nb-1 .. 0
    Lcols = jnp.moveaxis(L.reshape(n, nb, g), 1, 0)  # (nb, n, g)

    def step(E, inputs):
        Lk, Wk, k = inputs                           # (n, g), (m, g), ()
        WX = jax.lax.dot_general(E, Lk, (((1,), (0,)), ((), ())),
                                 precision=_PREC)    # (m, g)
        q, idx = cb.quantize(WX)
        E = jax.lax.dynamic_update_slice(E, Wk - q, (0, k * g))
        return E, (q, idx)

    ks = jnp.arange(nb - 1, -1, -1)
    Wg = jnp.moveaxis(Wr.reshape(m, nb, g), 1, 0)    # (nb, m, g)
    _, (qs, idxs) = jax.lax.scan(step, Wr, (Lcols[ks], Wg[ks], ks))
    # outputs are in reversed-k order; restore
    hatW = jnp.moveaxis(qs[::-1], 0, 1).reshape(m, n)
    Qidxs = idxs[::-1].T                             # (m, nb)

    if quip_tune_iters > 0:
        # greedy coordinate-descent refinement (parity: quant.py:125-134):
        # WXWX_k = hatWr_k + (Wr - hatWr) @ Hr[:, k] @ inv(Hr[k, k])
        Hcols = jnp.moveaxis(Hr.reshape(n, nb, g), 1, 0)       # (nb, n, g)
        Hdiag = Hcols.reshape(nb, nb, g, g)[jnp.arange(nb),
                                            jnp.arange(nb)]   # (nb, g, g)
        Hdiag_inv = jnp.linalg.inv(Hdiag)

        def tune_step(carry, inputs):
            hatW = carry
            Hk, Hki, Wk, k = inputs
            delta = Wr - hatW
            WX = jax.lax.dot_general(delta, Hk, (((1,), (0,)), ((), ())),
                                     precision=_PREC)
            WX = jax.lax.dot_general(WX, Hki, (((1,), (0,)), ((), ())),
                                     precision=_PREC)
            hk = jax.lax.dynamic_slice(hatW, (0, k * g), (m, g))
            q, idx = cb.quantize(hk + WX)
            hatW = jax.lax.dynamic_update_slice(hatW, q, (0, k * g))
            return hatW, idx

        def tune_iter(carry, _):
            hatW, _ = carry
            hatW, idxs_rev = jax.lax.scan(
                tune_step, hatW, (Hcols[ks], Hdiag_inv[ks], Wg[ks], ks))
            return (hatW, idxs_rev[::-1].T), None

        (hatW, Qidxs), _ = jax.lax.scan(
            tune_iter, (hatW, Qidxs), None, length=quip_tune_iters)

    return hatW, Qidxs
