"""quant_matmul: x @ W^T with W decoded on the fly from lattice codes.

Replaces the reference's two-regime dispatch (fused tinygemm GEMV for m<32,
decompress+cuBLAS for larger m, ``codebook/e8p12.py:144-156``). Implementations:

  - "dequant":  XLA decode to dense bf16, then one MXU matmul. Optimal for
                prefill / large m (the decode cost amortizes over m).
  - "pallas":   fused Pallas decode+matmul streaming codes HBM->VMEM
                (ops/dequant_pallas.py); optimal for small m (decode-bound).
  - "auto":     pick by m, mirroring the reference's m<32 threshold.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .dequant_xla import decode_weights
from .qtensor import QuantizedTensor

# TPU crossover: the fused kernel streams 4 bits/weight while the dense
# path writes+rereads a bf16 W (~5x HBM), and with m-tiling (TM<=32
# accumulator tiles) it stays register-resident at any m — measured
# whole-model: bs=32 decode 1887 vs 149 tok/s, S=512 prefill 3617 vs
# 3166 tok/s. The reference's m=32 CUDA threshold is wrong for TPU.
# The m in (1024, 2048] regime was settled on hardware in round 3
# (tools/R3_RESULTS.jsonl, Llama-2-7B E8P12 whole-model prefill):
# S=2048 dense 3985 tok/s vs fused 3458 (the per-m-tile plane re-decode
# at 64 m-tiles overtakes the dense path's extra HBM), while S=1024
# fused 3607 still beats dense — so the crossover stays at 1025.
# QFA_FUSED_MAX_M overrides it for hardware A/Bs — read at TRACE time
# (a function, not an import-time constant, so one process can A/B
# both regimes).
_DEFAULT_MAX_M = 1025


def fused_max_m() -> int:
    return int(os.environ.get("QFA_FUSED_MAX_M", str(_DEFAULT_MAX_M)))


def quant_matmul(x: jax.Array, qt: QuantizedTensor,
                 impl: str = "auto") -> jax.Array:
    """x: (m, q_in) -> (m, q_out)."""
    assert x.shape[-1] == qt.q_in, (x.shape, qt.q_in)
    if impl == "auto":
        use_pallas = x.shape[0] < fused_max_m() and _pallas_available(qt)
        impl = "pallas" if use_pallas else "dequant"
    if impl == "pallas":
        from .dequant_pallas import fused_quant_matmul, supports
        # hard error, not fallback: a forced pallas run on an unsupported
        # shape would silently compute garbage (q_out < tile size -> a
        # zero-step grid leaves the output uninitialized)
        assert supports(qt), (
            f"pallas kernel unsupported for q_out={qt.q_out} (needs "
            f"q_out % 128 == 0) / backend {jax.default_backend()!r}")
        return fused_quant_matmul(x, qt)
    W = decode_weights(qt, dtype=x.dtype)
    return jax.lax.dot_general(
        x, W, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _pallas_available(qt: QuantizedTensor) -> bool:
    try:
        from .dequant_pallas import supports
        return supports(qt)
    except Exception:
        return False
