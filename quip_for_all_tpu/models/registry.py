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
    if cfg.arch == "qwen":
        from . import qwen
        return qwen
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
    if cfg.arch in ("gptj", "qwen"):
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


# family -> (final norm param key, norm kind). Families absent from the
# table (llama/mixtral/baichuan) use ("norm", "rms").
_FINAL_NORM = {
    "gpt2": ("ln_f", "layer"),
    "gpt_neox": ("final_layer_norm", "layer"),
    "opt": ("final_layer_norm", "layer"),
    "falcon": ("ln_f", "layer"),
    "phi": ("final_layernorm", "layer"),
    "gptj": ("ln_f", "layer"),
    "qwen": ("ln_f", "rms"),
}

# family -> key of the tied-embedding matrix used as the output head when
# no standalone head linear exists.
_TIED_EMBED = {
    "gpt2": "wte",
    "gptj": "wte",
    "qwen": "wte",
    "falcon": "word_embeddings",
}


def final_hidden(cfg: ModelConfig, params, x):
    """Apply the family's final norm to hidden states x (..., D)."""
    key, kind = _FINAL_NORM.get(cfg.arch, ("norm", "rms"))
    if kind == "layer":
        from . import gpt2
        return gpt2.layer_norm(params[key], x, cfg.rms_norm_eps)
    from . import llama
    return llama.rms_norm(params[key]["weight"], x, cfg.rms_norm_eps)


def untied_head_key(cfg: ModelConfig, params):
    """Param key of the standalone output-head linear, or None when the
    head is tied to the embedding (and therefore not quantizable). The
    head may be a dense {'weight': ...} dict OR an already-quantized
    QuantLinearParams (quantize_lm_head=True) — linear_apply dispatches
    on both (llama.py linear_apply)."""
    key = "embed_out" if cfg.arch == "gpt_neox" else "lm_head"
    lin = params.get(key)
    if lin is None:
        return None
    if isinstance(lin, dict):
        return key if "weight" in lin else None
    return key           # QuantLinearParams (or another linear pytree)


def head_logits(cfg: ModelConfig, params, h, linear_kw=None):
    """Project final-norm'd hidden states to vocabulary logits."""
    from . import llama
    key = untied_head_key(cfg, params)
    if key is not None:
        return llama.linear_apply(params[key], h, **(linear_kw or {}))
    emb = _TIED_EMBED.get(cfg.arch, "embed_tokens")
    return h @ params[emb]["weight"].astype(h.dtype).T
