"""Pure-Python recomputation twin for the exact-BPE tokenization query.

The engines apply merges via a chained string ``replace()`` over the
double-separator symbol encoding (operators/textops.py). This twin
replays the tokenization with the textbook SYMBOL-LIST walk instead —
``tools.gen_bpe_merges.merge_word``, the very rule the trainer used — so
an encoding bug in the string trick (prefix/suffix false positives,
adjacent-pair consumption) fails a value comparison, not just a shape
check. Adversarial words for exactly those failure modes ride in a
crafted mini-corpus alongside the full sf0.001 sweep.
"""

from __future__ import annotations

import hashlib
import re

from amazon_climate_data_etl_spark.functions.bpe_vocab import MERGES
from amazon_climate_data_etl_spark.operators.textops import (
    _BPE_SEP,
    _bpe_stream,
    bpe_tokenize_profile,
)
from tools.gen_bpe_merges import merge_word

SF = "/root/testdata/sf0.001"


# ASCII-only lower, matching the engines' ascii_lower (r12, advice item):
# Python str.lower() maps e.g. 'İ' to 'i' + combining dot, inventing [a-z]+
# pre-tokens the engines never produce — the twin must not depend on the
# corpus happening to lack non-ASCII casing pairs.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _twin_tokenize(text: str) -> tuple[int, int, str]:
    """(n_words, n_tokens, token_md5) by the symbol-list rule."""
    words = re.findall("[a-z]+", text.translate(_ASCII_LOWER))
    streams = []
    n_tokens = 0
    for w in words:
        sym = list(w)
        for left, right in MERGES:
            sym = merge_word(sym, left, right)
        n_tokens += len(sym)
        streams.append(_BPE_SEP + (_BPE_SEP * 2).join(sym) + _BPE_SEP)
    s = " ".join(streams)
    return len(words), n_tokens, hashlib.md5(s.encode()).hexdigest()


def test_merge_list_fresh():
    """Retraining on the corpus must reproduce the committed module."""
    from collections import Counter

    import pyarrow.parquet as pq

    from tools.gen_bpe_merges import N_MERGES, train

    counts: Counter = Counter()
    for t in pq.read_table(
        f"{SF}/documents.parquet", columns=["text"]
    ).to_pydict()["text"]:
        counts.update(re.findall(r"[a-z]+", t.translate(_ASCII_LOWER)))
    assert train(counts, N_MERGES) == MERGES


def test_tokenize_twin_exact_full_corpus(spark):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expected = {
        i: _twin_tokenize(t)
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    got = bpe_tokenize_profile(spark, SF).collect()
    assert len(got) == len(expected)
    for r in got:
        nw, nt, h = expected[r.doc_id]
        assert (r.n_words, r.n_tokens, r.token_md5) == (nw, nt, h), r.doc_id
    # the corpus must actually exercise merging (tokens < chars, > words)
    assert any(r.n_tokens > r.n_words for r in got)
    assert all(r.n_tokens >= r.n_words for r in got)


def test_tokenize_twin_adversarial_words(spark):
    """Words built to break naive separator encodings: adjacent repeats of
    a merged pair (both must merge in one rank pass), a word whose symbol
    ENDS with a merge's left ('xer' must not fire (e, r) against a
    boundary-crossing match), prefix-extended rights, single chars, and a
    word that chains three merge generations."""
    crafted = [
        "erer inin stst",          # adjacent same-pair repeats
        "xer erx inx xin",         # boundary false-positive bait
        "e r er re",               # single symbols + the pair itself
        "merer spark sparkk",      # chained generations + unseen suffix
        "İstanbul STRASSE ΣΣ er",  # non-ASCII casing pairs: ascii_lower
        #   leaves 'İ'/'Σ' alone (str.lower would invent an extra 'i')
        "",                        # empty doc
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(crafted)], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    got = df.select("doc_id", _bpe_stream(F.col("text")).alias("s")).collect()
    for r in got:
        text = crafted[r.doc_id]
        words = re.findall("[a-z]+", text.translate(_ASCII_LOWER))
        streams = []
        for w in words:
            sym = list(w)
            for left, right in MERGES:
                sym = merge_word(sym, left, right)
            streams.append(_BPE_SEP + (_BPE_SEP * 2).join(sym) + _BPE_SEP)
        assert r.s == " ".join(streams), (r.doc_id, text, r.s)
