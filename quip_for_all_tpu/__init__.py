"""quip-for-all-tpu: TPU-native QuIP# lattice-codebook quantization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
chu-tianxiang/QuIP-for-all (CUDA/torch): 2/3/4-bit weight-only quantization
of causal LMs with E8/D4 lattice codebooks, randomized-Hadamard incoherence
processing, LDLQ adaptive rounding, fused dequant-matmul inference kernels,
and GSPMD tensor-parallel serving.

Public API (mirrors the reference's surface, ``quantizer.py:53,779``):

    from quip_for_all_tpu import QuipQuantizer, load_quantized_model, generate
"""
from .codebooks import codebook_id, get_codebook
from .models import llama
from .models.config import ModelConfig
from .nn.qlinear import QuantLinearParams
from .quantize.quantizer import QuipQuantizer
from .runtime.generate import (generate, generate_stream,
                               perplexity)
from .utils.checkpoint import load_quantized, save_quantized

# reference-parity alias
load_quantized_model = load_quantized

__version__ = "0.1.0"

__all__ = [
    "ModelConfig", "QuantLinearParams", "QuipQuantizer", "codebook_id",
    "generate", "generate_stream", "get_codebook", "llama",
    "load_quantized",
    "load_quantized_model", "perplexity", "save_quantized", "__version__",
]
