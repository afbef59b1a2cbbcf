"""Distributed BPE vs an INDEPENDENT pure-Python reference (the
Sennrich et al. 2016 algorithm written directly from the paper, no
shared code with operators/bpe.py): learned merge lists and encoded
token streams must match exactly. This replaces the DuckDB-oracle
protocol for an operator whose training loop (iterative argmax) is not
SQL-expressible."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.bpe import EOW, bpe_encode, bpe_train
from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


# -- reference implementation (paper pseudocode, driver-side) -----------
def ref_train(texts, n_merges, min_pair_count=2):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w[:-1]) + [w[-1] + EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def ref_encode(text, merges):
    rank = {p: i for i, p in enumerate(merges)}
    out = []
    for w in text.split():
        syms = list(w[:-1]) + [w[-1] + EOW]
        while len(syms) > 1:
            cands = [
                (rank[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in rank
            ]
            if not cands:
                break
            r, _ = min(cands)
            a, b = merges[r]
            new, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            syms = new
        out.extend(syms)
    return out


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide widest new",
    "low low low newer lowest",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_trained_merges_match_reference(spark, corpus):
    got = bpe_train(corpus, n_merges=12)
    exp = ref_train(TEXTS, 12)
    assert got == exp
    assert len(got) >= 8  # the corpus supports a real merge sequence


def test_encode_matches_reference(spark, corpus):
    merges = ref_train(TEXTS, 12)
    rows = {r.doc_id: r for r in bpe_encode(corpus, merges).collect()}
    for i, t in enumerate(TEXTS):
        exp = ref_encode(t, merges)
        assert list(rows[i].tokens) == exp, (i, rows[i].tokens, exp)
        assert rows[i].n_tokens == len(exp)


def test_roundtrip_reconstructs_text(spark, corpus):
    """Concatenating tokens and splitting at EOW reproduces the exact
    word stream — BPE is lossless."""
    merges = ref_train(TEXTS, 12)
    rows = {r.doc_id: r for r in bpe_encode(corpus, merges).collect()}
    for i, t in enumerate(TEXTS):
        joined = "".join(rows[i].tokens)
        assert joined == "".join(w + EOW for w in t.split())


def test_train_on_real_documents(spark):
    """Smoke at sf0.001 over the documents table: merge list is
    non-trivial, deterministic across two runs, and encoding with it
    covers every word (no token stream ends without EOW)."""
    docs = read_table(spark, SF, "documents").where(F.col("text").isNotNull())
    m1 = bpe_train(docs, n_merges=8)
    m2 = bpe_train(docs, n_merges=8)
    assert m1 == m2 and len(m1) == 8
    enc = bpe_encode(docs.limit(20), m1).collect()
    assert all(r.n_tokens > 0 for r in enc)
    for r in enc:
        assert r.tokens[-1].endswith(EOW)


def test_random_corpora_match_reference(spark):
    """Randomized cross-check: distributed train + encode equal the
    reference on generated corpora (seeded, 4 trials — each trial is a
    full multi-job Spark train loop, so the count stays small)."""
    import random

    rng = random.Random(77)
    alphabet = "abcdef"
    for trial in range(4):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(5, 12))
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
            for _ in range(rng.randint(2, 5))
        ]
        corpus = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        n = rng.randint(2, 8)
        got = bpe_train(corpus, n_merges=n)
        exp = ref_train(texts, n)
        assert got == exp, (trial, texts, got, exp)
        rows = {r.doc_id: list(r.tokens) for r in bpe_encode(corpus, exp).collect()}
        for i, t in enumerate(texts):
            assert rows[i] == ref_encode(t, exp), (trial, i)
