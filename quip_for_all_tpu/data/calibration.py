"""Calibration datasets for Hessian estimation.

Parity target: ``/root/reference/data.py`` (wikitext2 / c4 / c4-new / ptb /
ptb-new / redpajama loaders with seeded random window sampling). HF
``datasets`` loading is kept behind a lazy import (this build environment is
zero-egress; loaders work when a local HF cache or disk dataset is present).
A deterministic synthetic stream is provided for tests/benchmarks.
"""
from __future__ import annotations

import logging
from typing import Any, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_HF_SPECS = {
    # name -> (path, config, split, text_field)
    "wikitext2": ("wikitext", "wikitext-2-raw-v1", "train", "text"),
    "wikitext2-test": ("wikitext", "wikitext-2-raw-v1", "test", "text"),
    "c4": ("allenai/c4", "en", "train", "text"),
    "c4-new": ("allenai/c4", "en", "train", "text"),
    "ptb": ("ptb_text_only", "penn_treebank", "train", "sentence"),
    "ptb-new": ("ptb_text_only", "penn_treebank", "train", "sentence"),
    "redpajama": ("togethercomputer/RedPajama-Data-1T-Sample", None,
                  "train", "text"),
}


def synthetic_tokens(nsamples: int, seqlen: int, vocab_size: int,
                     seed: int = 0, process_seed: int = 12345) -> np.ndarray:
    """Deterministic, mildly structured token stream (order-1 Markov over a
    blockwise transition graph) — exercises non-uniform activation
    statistics without any dataset dependency. The underlying process is
    fixed by process_seed (so different `seed` draws are samples of the
    SAME distribution — train/eval splits are meaningful); `seed` drives
    only the sampling."""
    rng_proc = np.random.default_rng(process_seed)
    rng = np.random.default_rng(seed)
    n_states = min(64, vocab_size)
    trans = rng_proc.dirichlet(np.ones(n_states) * 0.2, size=n_states)
    toks = np.empty((nsamples, seqlen), dtype=np.int32)
    state = rng.integers(0, n_states, size=nsamples)
    for t in range(seqlen):
        u = np.array([rng.choice(n_states, p=trans[s]) for s in state])
        state = u
        toks[:, t] = (u * (vocab_size // n_states)
                      + rng.integers(0, max(1, vocab_size // n_states),
                                     size=nsamples))
    return toks % vocab_size


def _sample_windows(joined_ids: np.ndarray, nsamples: int, seqlen: int,
                    seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = joined_ids.shape[0]
    if n < seqlen + 1:
        raise ValueError(f"corpus too short: {n} tokens < seqlen {seqlen}")
    starts = rng.integers(0, n - seqlen - 1, size=nsamples)
    return np.stack([joined_ids[s:s + seqlen] for s in starts]).astype(
        np.int32)


def get_calibration_tokens(dataset: str, tokenizer: Any, nsamples: int,
                           seqlen: int, seed: int = 0,
                           vocab_size: Optional[int] = None) -> np.ndarray:
    """(nsamples, seqlen) int32 token windows (parity: data.py:236-283)."""
    if dataset in ("", "synthetic"):
        assert vocab_size is not None, "synthetic data needs vocab_size"
        return synthetic_tokens(nsamples, seqlen, vocab_size, seed)
    if dataset not in _HF_SPECS:
        raise ValueError(
            f"unknown dataset {dataset!r}; options: "
            f"{sorted(_HF_SPECS)} or 'synthetic'")
    path, config, split, field = _HF_SPECS[dataset]
    import datasets as hf_datasets  # lazy; needs local cache in zero-egress
    ds = hf_datasets.load_dataset(path, config, split=split)
    if dataset == "wikitext2" or dataset.startswith("wikitext"):
        text = "\n\n".join(ds[field])
        ids = np.asarray(tokenizer(text).input_ids, dtype=np.int64)
        return _sample_windows(ids, nsamples, seqlen, seed)
    # per-document sampling for large corpora (parity: data.py:106-135)
    rng = np.random.default_rng(seed)
    out = []
    idx_pool = rng.permutation(len(ds))
    for i in idx_pool:
        ids = np.asarray(tokenizer(ds[int(i)][field]).input_ids,
                         dtype=np.int64)
        if ids.shape[0] > seqlen:
            s = rng.integers(0, ids.shape[0] - seqlen)
            out.append(ids[s:s + seqlen])
        if len(out) == nsamples:
            break
    if len(out) < nsamples:
        raise ValueError("not enough long documents for calibration")
    return np.stack(out).astype(np.int32)
