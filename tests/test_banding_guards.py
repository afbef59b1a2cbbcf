"""Guard-rail tests for the MinHash/LSH banding helpers (ADVICE r12):

1. ``lsh_candidate_pairs`` must FAIL LOUD when bands exceed the
   signature width (rows_per_band floors to 0 -> every band key would
   md5('') and the whole corpus collapses into one bucket per band —
   a silent O(n^2) pair explosion otherwise).
2. Trailing signatures that don't divide into the band count are a
   warning, not silence.
3. The documented ``**minhash_bands_for_recall(...)`` splat must work
   VERBATIM against every consumer that recommends it (the helper's
   ``capped`` key is accepted and ignored).
4. A capped recall target warns at solve time in BOTH helpers, so a
   silently-lowered recall target cannot happen anywhere downstream.
"""

from __future__ import annotations

import warnings

import pytest

from github_etl_pipeline_spark.operators.dedup import (
    bands_for_recall,
    containment_pairs,
    dup_clusters,
    lsh_candidate_pairs,
    minhash_bands_for_recall,
    minhash_dedup_pairs,
    minhash_signature,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"tok{i} alpha beta gamma delta tok{i + 1} epsilon zeta") for i in range(8)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bands_wider_than_signature_raises(spark, docs):
    sig = minhash_signature(docs)  # default 16 sig_* columns
    with pytest.raises(ValueError, match="exceeds the signature width"):
        lsh_candidate_pairs(sig, bands=57)


def test_leakage_audit_misuse_raises_not_explodes(spark, docs):
    """The easy misuse ADVICE r12 flagged: split_leakage_audit(bands=57)
    with the default 16-hash signature must raise, not run O(n^2) — and
    the raise must fire BEFORE the shingle-base persist, so the misuse
    leaks no cached relation into the session (the full-suite cache-
    bookkeeping test downstream counts persistent RDDs)."""
    from github_etl_pipeline_spark.operators.curation import split_leakage_audit

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(ValueError, match="exceeds the signature width"):
        split_leakage_audit(docs, bands=57).collect()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == before


def test_trailing_signatures_warn(spark, docs):
    sig = minhash_signature(docs)
    with pytest.warns(UserWarning, match="do not divide"):
        lsh_candidate_pairs(sig, bands=3)  # 16 % 3 != 0 -> 1 sig unused


def test_splat_works_verbatim_against_every_documented_consumer(spark, docs):
    """Docstrings of minhash_dedup_pairs / dup_clusters /
    containment_pairs / split_leakage_audit all recommend passing
    ``**minhash_bands_for_recall(...)`` directly; the splat must not
    TypeError on the helper's ``capped`` key."""
    from github_etl_pipeline_spark.operators.curation import split_leakage_audit
    from github_etl_pipeline_spark.session import sweep_caches

    kw = minhash_bands_for_recall(0.5, target_recall=0.9)
    assert set(kw) == {"bands", "num_hashes", "capped"}
    assert minhash_dedup_pairs(docs, threshold=0.2, **kw).count() >= 0
    assert dup_clusters(docs, threshold=0.2, **kw).count() == docs.count()
    assert containment_pairs(docs, threshold=0.9, **kw).count() >= 0
    assert split_leakage_audit(docs, threshold=0.2, **kw).count() >= 0
    sweep_caches(spark)


def test_minhash_capped_target_warns():
    with pytest.warns(UserWarning, match="capped"):
        kw = minhash_bands_for_recall(0.2, target_recall=0.9, rows=2, max_bands=8)
    assert kw["capped"] and kw["bands"] == 8


def test_embedding_capped_target_warns():
    with pytest.warns(UserWarning, match="capped"):
        kw = bands_for_recall(200_000, target_recall=0.95, cos_threshold=0.85, max_bands=4)
    assert kw["capped"] and kw["bands"] == 4


def test_uncapped_targets_do_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        kw = minhash_bands_for_recall(0.2, target_recall=0.9, rows=2)
        assert not kw["capped"]
        kw2 = bands_for_recall(500, target_recall=0.9, cos_threshold=0.85)
        assert not kw2["capped"]
