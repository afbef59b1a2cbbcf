"""Token-budget data-mix sampler (operators/sampling.py): rate math
against an independent derivation, cap semantics, and determinism."""

import math

import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.sampling import (
    BUCKETS,
    token_budget_mix,
)

ROWS = [
    # source "big": 10 docs x 100 tokens; "small": 4 docs x 10 tokens
    *[(i, "big", " ".join(f"w{j}" for j in range(100))) for i in range(10)],
    *[(100 + i, "small", " ".join(f"w{j}" for j in range(10))) for i in range(4)],
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, source string, text string")


def test_rates_match_independent_math(spark, docs):
    """budget=520, equal weights (260/source): big has 1000 tokens ->
    rate 0.26 -> bucket 2600; small has 40 -> capped at 1.0 -> 10000."""
    out = {
        r["source"]: (r["rate_bucket"], r["n_docs"], r["n_tokens"])
        for r in token_budget_mix(docs, budget_tokens=520).collect()
    }
    assert out["big"][0] == math.floor(min(1.0, 520.0 * 0.5 / 1000.0) * BUCKETS) == 2600
    assert out["small"][0] == BUCKETS  # capped: cannot mint data
    # the capped source keeps EVERYTHING (shortfall visible, not rebalanced)
    assert out["small"][1] == 4 and out["small"][2] == 40
    # the uncapped source's realized tokens come from the coin at ~26%
    assert 0 < out["big"][1] <= 10
    assert out["big"][2] == out["big"][1] * 100


def test_explicit_weights_and_zero_weight(spark, docs):
    out = {
        r["source"]: r["rate_bucket"]
        for r in token_budget_mix(
            docs, budget_tokens=500, weights={"big": 1.0, "small": 0.0}
        ).collect()
    }
    assert out["small"] == 0  # zero weight -> zero rate, row still present
    assert out["big"] == math.floor(min(1.0, 500.0 * 1.0 / 1000.0) * BUCKETS) == 5000


def test_deterministic(spark, docs):
    a = sorted(map(tuple, token_budget_mix(docs, budget_tokens=520).collect()))
    b = sorted(map(tuple, token_budget_mix(docs, budget_tokens=520).collect()))
    assert a == b


def test_default_budget_is_half_corpus(spark, docs):
    out = {r["source"]: r["rate_bucket"] for r in token_budget_mix(docs).collect()}
    # total = 1040 -> budget 520, equal weights -> same as the explicit case
    assert out["big"] == 2600 and out["small"] == BUCKETS
