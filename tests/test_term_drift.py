"""Chi-square term drift (plans/extensions.py::term_drift_documents
machinery): formula exactness and seeded-drift detection."""

import pandas as pd

from pyspark.sql import functions as F


def _drift(spark, rows, src="A", topk=5):
    # inline reimplementation parametrized by source, mirroring the
    # registered query's plan over an arbitrary (source, text) relation
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "text"]))
    tok = docs.select(
        "source", F.explode(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).alias("term")
    )
    per = tok.groupBy("term").agg(
        F.count_if(F.col("source") == src).alias("n_src"),
        F.count_if(F.col("source") != src).alias("n_rest"),
    )
    tot = per.agg(F.sum("n_src").alias("a_tot"), F.sum("n_rest").alias("b_tot"))
    j = per.crossJoin(F.broadcast(tot))
    a, b = F.col("n_src").cast("double"), F.col("n_rest").cast("double")
    at, bt = F.col("a_tot").cast("double"), F.col("b_tot").cast("double")
    ea = (F.col("n_src") + F.col("n_rest")).cast("double") * (at / (at + bt))
    eb = (F.col("n_src") + F.col("n_rest")).cast("double") * (bt / (at + bt))
    chi2 = F.round(((a - ea) * (a - ea)) / ea + ((b - eb) * (b - eb)) / eb, 6)
    return (
        j.select("term", "n_src", "n_rest", chi2.alias("chi2"))
        .orderBy(F.col("chi2").desc(), F.col("term").asc())
        .limit(topk)
        .collect()
    )


def test_seeded_drift_tops(spark):
    # 'anomalous' appears ONLY in source A; common words are balanced
    rows = [("A", "the cat anomalous anomalous"), ("B", "the cat sat"),
            ("B", "the cat ran")]
    out = _drift(spark, rows)
    assert out[0]["term"] == "anomalous"
    assert out[0]["n_src"] == 2 and out[0]["n_rest"] == 0
    # hand-computed 2x2 chi-square: a=2,b=0 with totals A=4,B=6 ->
    # ea=2*0.4=0.8, eb=1.2 -> 1.44/0.8 + 1.44/1.2 = 3.0
    assert out[0]["chi2"] == 3.0


def test_balanced_term_scores_zero(spark):
    rows = [("A", "x x y"), ("B", "x x y")]
    out = {r["term"]: r["chi2"] for r in _drift(spark, rows)}
    assert out["x"] == 0.0 and out["y"] == 0.0


def test_registered_query_runs(spark):
    from github_etl_pipeline_spark.plans import REGISTRY

    out = (
        REGISTRY["term_drift_documents"]
        .builder(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    assert len(out) == 20
    assert (out.chi2 >= 0).all()
    # monotone by construction of the top-k
    assert list(out.chi2) == sorted(out.chi2, reverse=True)
