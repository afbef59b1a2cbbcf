"""M6: README-era extended statistics vs the worked example
(README.md:53-105 for Pool_0201_395.pol — values verified in SURVEY §5)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from github_etl_pipeline_spark.operators.stats import pool_extended_stats
from github_etl_pipeline_spark.sources.pol import parse_pol_lines, read_pol_lines


@pytest.fixture(scope="module")
def stats_row(spark):
    lines = read_pol_lines(spark, "/root/reference/samples/pools2")
    parsed = parse_pol_lines(lines, with_order=True)
    df = pool_extended_stats(parsed)
    rows = [r for r in df.collect() if r.source_file == "Pool_0201_395.pol"]
    assert len(rows) == 1
    return rows[0]


def test_readme_summary_stats(stats_row):
    r = stats_row
    assert r.total_records == 100000
    assert r.total_sum == 118744550
    assert r.min_value == 375
    assert r.max_value == 25000
    assert r.avg_value == 1187.45
    assert r.median_value == 850.0
    assert r.std_value == pytest.approx(858.95, abs=0.01)
    assert r.unique_types == 5


def test_readme_type_distribution(stats_row):
    # README.md:77-83: TB3:29550 TF1:27850 TB2:22750 TB1:19740 TF2:110
    assert dict(stats_row.type_distribution) == {
        "TB3": 29550,
        "TF1": 27850,
        "TB2": 22750,
        "TB1": 19740,
        "TF2": 110,
    }


def test_type_statistics_sorted_with_pct(stats_row):
    ts = stats_row.type_statistics
    assert [t.type_code for t in ts] == ["TB3", "TF1", "TB2", "TB1", "TF2"]
    assert ts[0]["count"] == 29550
    assert ts[0]["pct"] == pytest.approx(29.55, abs=0.01)
    assert sum(t["count"] for t in ts) == 100000


def test_value_histogram(stats_row):
    vd = {b.bucket: b["count"] for b in stats_row.value_distribution}
    assert sum(vd.values()) == 100000
    assert set(vd) <= {"0-500", "501-1000", "1001-2000", "2001-5000", "5001-10000", "10001+"}
    pcts = [b["pct"] for b in stats_row.value_distribution]
    assert abs(sum(pcts) - 100.0) < 0.5


def test_first_last_k_match_file(stats_row):
    # first/last lines of the actual file (order-sensitive sampling)
    with open("/root/reference/samples/pools2/Pool_0201_395.pol") as f:
        lines = [l.split()[0] for l in f if l.strip()]
    expect_first = [int(v) for v in lines[:10]]
    expect_last = [int(v) for v in lines[-10:]]
    assert list(stats_row.first_k) == expect_first
    assert list(stats_row.last_k) == expect_last


def test_bm25_ranked_retrieval_matches_reference_formula(spark):
    """Planted corpus with hand-computable Okapi BM25 (k1=1.2, b=0.75):
    the operator must reproduce the reference formula and rank docs with
    more distinct query-term mass higher; docs with no query terms never
    appear."""
    import math

    from github_etl_pipeline_spark.operators.text import bm25_topk

    docs = [
        (1, "spark joins data fast spark"),   # 'spark' x2 of 5
        (2, "spark only once here"),          # 'spark' x1 of 4
        (3, "unrelated words entirely"),      # no hit -> absent
        (4, "joins joins joins joins"),       # 'joins' x4 of 4
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, ("spark", "joins"), topk=10).collect()}
    assert set(got) == {1, 2, 4}

    # independent reference computation
    k1, b = 1.2, 0.75
    dls = {1: 5, 2: 4, 3: 3, 4: 4}
    n, avgdl = 4, sum(dls.values()) / 4
    dfreq = {"spark": 2, "joins": 2}
    tfs = {1: {"spark": 2, "joins": 1}, 2: {"spark": 1}, 4: {"joins": 4}}

    def score(doc):
        s = 0.0
        for t, tf in tfs[doc].items():
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[doc] / avgdl))
        return round(s, 6)

    for d in (1, 2, 4):
        assert abs(got[d] - score(d)) < 1e-9, (d, got[d], score(d))
    # doc 1 carries both terms -> outranks the single-term docs
    assert got[1] > got[2]


def test_streak_summary(spark):
    from github_etl_pipeline_spark.operators.stats import streak_summary

    rows = [
        # u: days 1,2,3 | 7 | 9,10 -> longest 3 from 1; dup day 2 ignored
        ("u", 1), ("u", 2), ("u", 2), ("u", 3), ("u", 7), ("u", 9), ("u", 10),
        # v: two runs of equal length 2 -> earliest start wins (4)
        ("v", 4), ("v", 5), ("v", 8), ("v", 9),
        # w: single day
        ("w", 42),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "day"]))
    out = {r["k"]: r for r in streak_summary(df, ["k"], "day").collect()}
    assert (out["u"]["n_active"], out["u"]["n_streaks"]) == (6, 3)
    assert (out["u"]["longest_streak"], out["u"]["longest_streak_start"]) == (3, 1)
    assert (out["v"]["longest_streak"], out["v"]["longest_streak_start"]) == (2, 4)
    assert (out["w"]["n_active"], out["w"]["n_streaks"], out["w"]["longest_streak"]) == (1, 1, 1)
    assert out["w"]["longest_streak_start"] == 42


def test_streak_negative_days(spark):
    # pre-epoch sequence values: consecutive negatives still chain
    from github_etl_pipeline_spark.operators.stats import streak_summary

    df = spark.createDataFrame(
        pd.DataFrame([("u", -3), ("u", -2), ("u", 0)], columns=["k", "day"])
    )
    r = streak_summary(df, ["k"], "day").collect()[0]
    assert (r["longest_streak"], r["longest_streak_start"], r["n_streaks"]) == (2, -3, 2)
