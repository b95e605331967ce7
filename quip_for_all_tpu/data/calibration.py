"""Calibration datasets for Hessian estimation.

Parity target: ``/root/reference/data.py:85-283`` (wikitext2 / c4 / c4-new /
ptb / ptb-new / redpajama loaders, each with train/validation split
selection and seeded random window sampling). HF ``datasets`` loading is
kept behind the ``_load_hf`` seam (this build environment is zero-egress;
loaders work when a local HF cache or disk dataset is present, and tests
exercise the full sampling logic through an injected in-memory dataset).
A deterministic synthetic stream is provided for tests/benchmarks.

Two sampling modes, matching the reference exactly:
  * join-mode (wikitext2, ptb, ptb-new): concatenate the whole split into
    one token stream, take nsamples random seqlen windows
    (data.py:85-104, 173-214);
  * document-mode (c4, c4-new, redpajama): resample random documents until
    one tokenizes to >= seqlen tokens, take one random window from it
    (data.py:106-136, 138-170, 215-233).
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

# the single c4 shard files the reference pins (data.py:107-121) — keeps a
# zero-egress-sized download instead of the full 305GB corpus
_C4_FILES = {
    "train": {"train": "en/c4-train.00000-of-01024.json.gz"},
    "validation": {"validation": "en/c4-validation.00000-of-00008.json.gz"},
}

# name -> (hf_path, hf_config, {split: hf_split}, text_field, mode)
_HF_SPECS = {
    "wikitext2": ("wikitext", "wikitext-2-raw-v1",
                  {"train": "train", "validation": "test"}, "text", "join"),
    "c4": ("allenai/c4", "allenai--c4",
           {"train": "train", "validation": "validation"}, "text", "doc"),
    "c4-new": ("allenai/c4", "allenai--c4",
               {"train": "train", "validation": "validation"}, "text",
               "doc"),
    "ptb": ("ptb_text_only", "penn_treebank",
            {"train": "train", "validation": "validation"}, "sentence",
            "join"),
    "ptb-new": ("ptb_text_only", "penn_treebank",
                {"train": "train", "validation": "test"}, "sentence",
                "join"),
    "redpajama": ("togethercomputer/RedPajama-Data-1T-Sample", None,
                  {"train": "train"}, "text", "doc"),
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


def _load_hf(name: str, split: str):
    """Load the HF dataset for a spec name/split. Patchable seam for tests
    (and the only place the `datasets` package is touched)."""
    path, config, split_map, _, _ = _HF_SPECS[name]
    hf_split = split_map[split]
    import datasets as hf_datasets  # lazy; needs local cache in zero-egress
    if name in ("c4", "c4-new"):
        return hf_datasets.load_dataset(
            path, config, data_files=_C4_FILES[split], split=hf_split)
    if config is None:
        return hf_datasets.load_dataset(path, split=hf_split)
    return hf_datasets.load_dataset(path, config, split=hf_split)


def _join_text(name: str, texts) -> str:
    if name.startswith("wikitext"):
        # reference joins with " \n" for empty lines (data.py:93)
        return "".join(" \n" if s == "" else s for s in texts)
    return " ".join(texts)


def _sample_windows(joined_ids: np.ndarray, nsamples: int, seqlen: int,
                    seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = joined_ids.shape[0]
    if n < seqlen:
        raise ValueError(f"corpus too short: {n} tokens < seqlen {seqlen}")
    # start range inclusive of n - seqlen, matching the reference's
    # random.randint(0, n - seqlen) (data.py:98)
    starts = rng.integers(0, n - seqlen + 1, size=nsamples)
    return np.stack([joined_ids[s:s + seqlen] for s in starts]).astype(
        np.int32)


def _tokenize(tokenizer: Any, text: str) -> np.ndarray:
    ids = tokenizer(text).input_ids
    return np.asarray(ids, dtype=np.int64)


def _file_corpus_tokens(spec: str, tokenizer: Any, nsamples: int,
                        seqlen: int, seed: int) -> np.ndarray:
    """Sample calibration windows from a LOCAL corpus file.

    ``file:/path/corpus.txt``        join-mode over the raw text
    ``file:/path/docs.jsonl``        doc-mode, one window per JSON object's
                                     "text" field (c4-style layout)
    ``file:/path/docs.jsonl#body``   same, custom field name

    This is the zero-egress escape hatch: the HF loaders (`wikitext2`,
    `c4`, ...) need a local datasets cache, but any text corpus on disk
    works through this path with the same seeded sampling semantics as the
    reference's get_dataset (data.py:236-283)."""
    import json
    import os.path

    field = "text"
    if "#" in spec:
        spec, field = spec.rsplit("#", 1)
    if not os.path.exists(spec):
        raise FileNotFoundError(f"calibration corpus not found: {spec}")
    if spec.endswith((".jsonl", ".ndjson")):
        with open(spec, "r", encoding="utf-8") as f:
            docs = [json.loads(line)[field] for line in f if line.strip()]
        rng = np.random.default_rng(seed)
        out: list = []
        attempts = 0
        while len(out) < nsamples:
            i = int(rng.integers(0, len(docs)))
            ids = _tokenize(tokenizer, docs[i])
            attempts += 1
            if ids.shape[0] >= seqlen:
                s = int(rng.integers(0, ids.shape[0] - seqlen + 1))
                out.append(ids[s:s + seqlen])
            elif attempts > 50 * nsamples:
                raise ValueError("not enough long documents in corpus")
        return np.stack(out).astype(np.int32)
    with open(spec, "r", encoding="utf-8") as f:
        ids = _tokenize(tokenizer, f.read())
    return _sample_windows(ids, nsamples, seqlen, seed)


def get_calibration_tokens(dataset: str, tokenizer: Any, nsamples: int,
                           seqlen: int, seed: int = 0,
                           split: str = "train",
                           vocab_size: Optional[int] = None) -> np.ndarray:
    """(nsamples, seqlen) int32 token windows
    (parity: data.py:236-283 get_dataset incl. split selection)."""
    if dataset in ("", "synthetic"):
        assert vocab_size is not None, "synthetic data needs vocab_size"
        return synthetic_tokens(nsamples, seqlen, vocab_size, seed)
    if dataset.startswith("file:"):
        # local corpus (no network/HF cache needed): plain text joins the
        # whole file into one stream; .jsonl samples per-document like c4
        # (field "text"). The path may carry an optional "#field" suffix.
        return _file_corpus_tokens(dataset[5:], tokenizer, nsamples,
                                   seqlen, seed)
    if dataset == "wikitext2-test":      # back-compat alias
        dataset, split = "wikitext2", "validation"
    if dataset not in _HF_SPECS:
        raise ValueError(
            f"unknown dataset {dataset!r}; options: "
            f"{sorted(_HF_SPECS)} or 'synthetic'")
    if split not in ("train", "validation"):
        raise ValueError(
            f"split must be 'train' or 'validation', got {split!r}")
    split_map, field, mode = _HF_SPECS[dataset][2:]
    if split not in split_map:
        raise ValueError(f"{dataset} has no {split!r} split")
    ds = _load_hf(dataset, split)
    if mode == "join":
        text = _join_text(dataset, ds[field])
        ids = _tokenize(tokenizer, text)
        return _sample_windows(ids, nsamples, seqlen, seed)
    # document-mode (c4/redpajama): random documents, one window each
    # (parity: data.py:123-135 — resample until the doc is long enough)
    rng = np.random.default_rng(seed)
    out: list = []
    n_docs = len(ds)
    attempts = 0
    while len(out) < nsamples:
        i = int(rng.integers(0, n_docs))
        ids = _tokenize(tokenizer, ds[i][field])
        attempts += 1
        if ids.shape[0] >= seqlen:
            s = int(rng.integers(0, ids.shape[0] - seqlen + 1))
            out.append(ids[s:s + seqlen])
        elif attempts > 50 * nsamples:
            raise ValueError("not enough long documents for calibration")
    return np.stack(out).astype(np.int32)
