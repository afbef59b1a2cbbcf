"""Partition pruning: a table written partitioned by a column scans ONLY
the matching partition directories when filtered on it — the primary
100-TB scan-reduction lever alongside bucketing (README 'Execution
design'; SURVEY §4 partition strategy)."""

from pyspark.sql import functions as F

from github_etl_pipeline_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_scan(spark, tmp_path):
    events = read_table(spark, SF, "events")
    out = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").parquet(out)

    q = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]

    # only the click partition directory is in the scanned files
    files = [r[0] for r in q.select(F.input_file_name()).distinct().collect()]
    assert files and all("event_type=click" in f for f in files)

    # and the pruned read returns exactly the right rows
    assert q.count() == events.where(F.col("event_type") == "click").count()
