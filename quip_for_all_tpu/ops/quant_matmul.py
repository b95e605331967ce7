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

import jax
import jax.numpy as jnp

from .dequant_xla import decode_weights
from .qtensor import QuantizedTensor

_SMALL_M = 32


def quant_matmul(x: jax.Array, qt: QuantizedTensor,
                 impl: str = "auto") -> jax.Array:
    """x: (m, q_in) -> (m, q_out)."""
    assert x.shape[-1] == qt.q_in, (x.shape, qt.q_in)
    if impl == "auto":
        use_pallas = x.shape[0] < _SMALL_M and _pallas_available(qt)
        impl = "pallas" if use_pallas else "dequant"
    if impl == "pallas":
        from .dequant_pallas import fused_quant_matmul
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
