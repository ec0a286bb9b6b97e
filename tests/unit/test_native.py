"""C++ text analyzer parity vs the Python implementations.

Native and Python paths must produce byte-identical output on ASCII input
(the native dispatch contract); non-ASCII must route to Python.
"""

import numpy as np
import pytest

from archi_tpu.engine import bm25 as bm25_mod
from archi_tpu.engine.bm25 import STOPWORDS, analyze
from archi_tpu.models.tokenizer import WordPieceTokenizer, basic_tokenize
from archi_tpu.native import (
    NativeWordPiece, load_library, native_analyze,
)
from archi_tpu.utils.stemmer import stem as porter_stem

lib = load_library()
pytestmark = pytest.mark.skipif(lib is None, reason="no native toolchain")

TEXTS = [
    "The quick brown Fox jumps over the lazy dog!",
    "Running, jumped, and flies: relational conditionals " * 3,
    "numbers 123 456 mixed a1b2 x,y;z",
    "   lots   of\twhitespace\nand\r\nnewlines  ",
    "punct...only!!! ??? ---",
    "",
    "a",  # single char filtered
    "GPU partitions require approval; quotas are 100GB per user.",
    "word " * 500,
]


def _python_analyze(text, stemming):
    toks = [t for t in basic_tokenize(text)
            if len(t) > 1 and not t.isdigit() and t not in STOPWORDS
            and t.isalnum()]
    return [porter_stem(t) for t in toks] if stemming else toks


@pytest.mark.parametrize("stemming", [False, True])
def test_analyze_parity(stemming):
    for text in TEXTS:
        native = native_analyze(text, stemming=stemming)
        assert native is not None
        assert native == _python_analyze(text, stemming), (text, stemming)


def test_analyze_dispatch_non_ascii():
    # accented latin transliterates to the same terms the python path yields
    assert native_analyze("café naïve") == ["cafe", "naive"]
    assert "cafe" in analyze("café naïve résumé")
    # non-transliterable scripts route to the python path
    assert native_analyze("日本語のテキスト") is None
    # typographic punctuation/box-drawing transliterates cleanly
    assert native_analyze("jobs — “quoted” │ queue") == ["jobs", "quoted",
                                                         "queue"]


def test_porter_parity_wordlist():
    words = ("caresses ponies ties caress cats feed agreed plastered motoring "
             "sing conflated troubling sized hopping happy relational "
             "conditional rational digitizer operator triplicate formative "
             "electrical hopefulness goodness revival adjustment effective "
             "probate cease controll roll generalization oscillators "
             "predication vietnamization renewal allowance inference "
             "defensible irritant replacement adjustable dependent").split()
    for w in words:
        native = native_analyze(w + " " + w, stemming=True)
        expect = porter_stem(w)
        if len(w) > 1 and w not in STOPWORDS:
            assert native == [expect, expect], (w, native, expect)


def test_wordpiece_parity():
    tok = WordPieceTokenizer.build_vocab([
        "the quick brown fox jumps over lazy dogs",
        "running jumping playing wordpieces subword units",
    ])
    tok._native = None  # force fresh
    native = NativeWordPiece(tok.vocab)
    for text in TEXTS:
        py_ids = [tok.vocab.get(p, tok.unk_id) for p in tok.tokenize(text)]
        py_full = [tok.cls_id] + py_ids[:126] + [tok.sep_id]
        n_ids = native.encode(text, 128, cls_id=tok.cls_id,
                              sep_id=tok.sep_id, unk_id=tok.unk_id)
        assert n_ids == py_full, text


def test_wordpiece_encode_uses_native_and_matches():
    tok = WordPieceTokenizer.build_vocab(["hello world wordpiece test"])
    ids_via_encode = tok.encode("hello world unknownzzz", 64)
    assert tok._native_encoder() is not None
    # recompute via pure python for comparison
    py = [tok.vocab.get(p, tok.unk_id) for p in tok.tokenize(
        "hello world unknownzzz")]
    assert ids_via_encode == [tok.cls_id] + py + [tok.sep_id]


def test_bm25_scores_identical_with_native(monkeypatch):
    """BM25 index built with native analyze == built with python analyze."""
    from archi_tpu.engine.bm25 import BM25Index

    docs = [t for t in TEXTS if t.strip()]
    idx_native = BM25Index(stemming=True)
    idx_native.add(list(range(len(docs))), docs)
    s_native = np.asarray(idx_native.scores("quick fox running", 16))

    import archi_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "native_analyze",
                        lambda text, stemming=False: None)
    idx_py = BM25Index(stemming=True)
    idx_py.add(list(range(len(docs))), docs)
    s_py = np.asarray(idx_py.scores("quick fox running", 16))
    np.testing.assert_allclose(s_native, s_py)
