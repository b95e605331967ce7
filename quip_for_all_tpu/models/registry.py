"""Architecture registry: uniform functional API per model family
(the role of the reference's BLOCK_PATTERNS genericity,
``constants.py:19-24``)."""
from __future__ import annotations

from .config import ModelConfig


def get_arch(cfg: ModelConfig):
    """Return the module implementing this config's family."""
    if cfg.arch == "gpt2":
        from . import gpt2
        return gpt2
    if cfg.arch == "gpt_neox":
        from . import gpt_neox
        return gpt_neox
    if cfg.arch == "opt":
        from . import opt
        return opt
    if cfg.arch == "falcon":
        from . import falcon
        return falcon
    if cfg.arch == "phi":
        from . import phi
        return phi
    if cfg.arch == "gptj":
        from . import gptj
        return gptj
    from . import llama
    return llama


def embed(cfg: ModelConfig, params, ids, positions, dtype):
    import jax.numpy as jnp
    if cfg.arch == "gpt2":
        x = jnp.take(params["wte"]["weight"], ids, axis=0).astype(dtype)
        return x + jnp.take(params["wpe"]["weight"], positions,
                            axis=0).astype(dtype)
    if cfg.arch == "gpt_neox":
        return jnp.take(params["embed_in"]["weight"], ids,
                        axis=0).astype(dtype)
    if cfg.arch == "gptj":
        return jnp.take(params["wte"]["weight"], ids,
                        axis=0).astype(dtype)
    if cfg.arch == "opt":
        from .opt import POS_OFFSET
        x = jnp.take(params["embed_tokens"]["weight"], ids,
                     axis=0).astype(dtype)
        return x + jnp.take(params["embed_positions"]["weight"],
                            positions + POS_OFFSET, axis=0).astype(dtype)
    if cfg.arch == "falcon":
        return jnp.take(params["word_embeddings"]["weight"], ids,
                        axis=0).astype(dtype)
    return jnp.take(params["embed_tokens"]["weight"], ids,
                    axis=0).astype(dtype)


def rope_tables(cfg: ModelConfig, positions):
    if cfg.arch in ("gpt2", "opt"):
        return None, None
    if cfg.arch in ("gpt_neox", "phi"):
        from . import gpt_neox
        return gpt_neox.rope_tables(cfg, positions)
    if cfg.arch == "gptj":
        from . import gptj
        return gptj.rope_tables(cfg, positions)
    from . import llama
    return llama.rope_tables(cfg, positions)
