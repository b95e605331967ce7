"""Calibration loaders: join-mode and document-mode sampling, split
selection, determinism (VERDICT r1 missing #6 — parity:
/root/reference/data.py:85-283). The HF fetch is stubbed through the
`_load_hf` seam with in-memory corpora; everything downstream (joining,
tokenization, window sampling) is the real code path."""
import numpy as np
import pytest

from quip_for_all_tpu.data import calibration as C


class WordTokenizer:
    """Whitespace tokenizer: deterministic, vocab = hash buckets."""

    class _Enc:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [hash(w) % 1000 for w in text.split()]
        return self._Enc(ids)


class FakeDataset:
    def __init__(self, rows, field):
        self._rows = rows
        self._field = field

    def __len__(self):
        return len(self._rows)

    def __getitem__(self, k):
        if isinstance(k, str):
            assert k == self._field
            return self._rows
        return {self._field: self._rows[k]}


@pytest.fixture
def patched_hf(monkeypatch):
    loaded = {}

    def fake_load(name, split):
        field = C._HF_SPECS[name][3]
        loaded["last"] = (name, split)
        if C._HF_SPECS[name][4] == "join":
            rows = [f"{split} doc{i} " + " ".join(
                f"w{i}_{j}" for j in range(30)) if i % 3 else ""
                for i in range(100)]
        else:
            # doc-mode: mix of short docs and long-enough docs
            rows = [" ".join(f"{split}tok{i}_{j}" for j in range(
                5 if i % 2 else 80)) for i in range(60)]
        return FakeDataset(rows, field)

    monkeypatch.setattr(C, "_load_hf", fake_load)
    return loaded


def test_join_mode_windows(patched_hf):
    toks = C.get_calibration_tokens("wikitext2", WordTokenizer(), 6, 16,
                                    seed=3)
    assert toks.shape == (6, 16) and toks.dtype == np.int32
    assert patched_hf["last"] == ("wikitext2", "train")
    # deterministic under the same seed, different under another
    toks2 = C.get_calibration_tokens("wikitext2", WordTokenizer(), 6, 16,
                                     seed=3)
    np.testing.assert_array_equal(toks, toks2)
    toks3 = C.get_calibration_tokens("wikitext2", WordTokenizer(), 6, 16,
                                     seed=4)
    assert not np.array_equal(toks, toks3)


def test_validation_split_selected(patched_hf):
    C.get_calibration_tokens("wikitext2", WordTokenizer(), 2, 8,
                             split="validation")
    assert patched_hf["last"] == ("wikitext2", "validation")
    # back-compat alias maps to wikitext2 validation
    C.get_calibration_tokens("wikitext2-test", WordTokenizer(), 2, 8)
    assert patched_hf["last"] == ("wikitext2", "validation")
    # ptb has a true validation split; ptb-new maps validation -> test
    C.get_calibration_tokens("ptb", WordTokenizer(), 2, 8,
                             split="validation")
    assert patched_hf["last"] == ("ptb", "validation")


def test_doc_mode_skips_short_documents(patched_hf):
    toks = C.get_calibration_tokens("c4", WordTokenizer(), 5, 32, seed=0)
    assert toks.shape == (5, 32)
    assert patched_hf["last"] == ("c4", "train")
    toksv = C.get_calibration_tokens("c4", WordTokenizer(), 5, 32, seed=0,
                                     split="validation")
    assert patched_hf["last"] == ("c4", "validation")
    # validation windows come from the validation corpus (disjoint vocab)
    assert not np.array_equal(toks, toksv)


def test_doc_mode_raises_when_all_docs_short(monkeypatch):
    monkeypatch.setattr(
        C, "_load_hf",
        lambda name, split: FakeDataset(["a b c"] * 10, "text"))
    with pytest.raises(ValueError, match="long documents"):
        C.get_calibration_tokens("c4", WordTokenizer(), 4, 64)


def test_redpajama_has_no_validation(patched_hf):
    with pytest.raises(ValueError, match="no 'validation'"):
        C.get_calibration_tokens("redpajama", WordTokenizer(), 2, 8,
                                 split="validation")


def test_unknown_dataset_and_split():
    with pytest.raises(ValueError, match="unknown dataset"):
        C.get_calibration_tokens("nope", WordTokenizer(), 1, 8)
    with pytest.raises(ValueError, match="split"):
        C.get_calibration_tokens("wikitext2", WordTokenizer(), 1, 8,
                                 split="test")


def test_file_corpus_txt_join_mode(tmp_path):
    """file: spec over a plain-text corpus — join-mode windows, seeded."""
    words = " ".join(f"w{i % 97}" for i in range(5000))
    p = tmp_path / "corpus.txt"
    p.write_text(words)
    tok = WordTokenizer()
    a = C.get_calibration_tokens(f"file:{p}", tok, 6, 64, seed=3)
    b = C.get_calibration_tokens(f"file:{p}", tok, 6, 64, seed=3)
    c = C.get_calibration_tokens(f"file:{p}", tok, 6, 64, seed=4)
    assert a.shape == (6, 64) and a.dtype == np.int32
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_file_corpus_jsonl_doc_mode(tmp_path):
    """file: spec over .jsonl — doc-mode (one window per long-enough doc),
    custom field via #suffix, short docs resampled away."""
    import json
    rows = [{"body": "short doc"},
            {"body": " ".join(f"t{i}" for i in range(400))},
            {"body": " ".join(f"u{i}" for i in range(300))}]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    tok = WordTokenizer()
    out = C.get_calibration_tokens(f"file:{p}#body", tok, 5, 128, seed=0)
    assert out.shape == (5, 128)


def test_file_corpus_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        C.get_calibration_tokens("file:/nonexistent/x.txt",
                                 WordTokenizer(), 2, 16, seed=0)
