"""Hessian (input second-moment) accumulation for proxy-loss quantization.

Parity target: ``/root/reference/quip.py:43-69`` (QUIP.add_batch). The
reference accumulates H = 2/N · Σ x xᵀ in float64 with a running
renormalization; since quant() immediately renormalizes H by its mean
diagonal (``quip.py:94``), the leading constant is irrelevant and we
accumulate the raw second moment. TPUs have no fast fp64, so accumulation is
float32 matmuls (exact-ish blocked reductions inside XLA) combined across
batches with Kahan compensation.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HessianState:
    H: jax.Array          # (n, n) f32 compensated sum of x x^T
    comp: jax.Array       # (n, n) f32 Kahan compensation
    count: jax.Array      # () f32 number of rows accumulated

    @staticmethod
    def zeros(n: int) -> "HessianState":
        z = jnp.zeros((n, n), dtype=jnp.float32)
        return HessianState(z, z, jnp.zeros((), dtype=jnp.float32))


@jax.jit
def accumulate(state: HessianState, x: jax.Array) -> HessianState:
    """Add a batch of activations x (..., n) to the running second moment."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    delta = jax.lax.dot_general(x, x, (((0,), (0,)), ((), ())),
                                precision=_PREC)
    # Kahan: y = delta - comp; t = H + y; comp = (t - H) - y; H = t
    y = delta - state.comp
    t = state.H + y
    comp = (t - state.H) - y
    return HessianState(t, comp, state.count + x.shape[0])


def finalize(state: HessianState) -> jax.Array:
    """Mean second moment (n, n); the 2/N scaling of the reference is
    dropped because quant() renormalizes by mean(diag(H)) anyway."""
    return state.H / jnp.maximum(state.count, 1.0)
