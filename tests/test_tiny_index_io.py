"""Driver-side IO for driver-bounded index relations (r14, guide §5):
``write_centroids``/``read_centroids`` and ``write_codebooks``/
``read_codebooks`` replace one whole Spark job per tiny write/read.
Pinned here: (a) round-trip exactness, (b) cross-writer compatibility —
spark.read.parquet consumes pyarrow-written dirs and the pyarrow reader
consumes Spark-written dirs (with _SUCCESS markers) byte-for-value
identically, so index dirs from older builds keep working."""

from github_etl_pipeline_spark.operators.pq import (
    read_codebooks,
    write_codebooks,
)
from github_etl_pipeline_spark.operators.similarity import (
    read_centroids,
    write_centroids,
)

CENTROIDS = [(0, [1.0, 2.5, -3.0]), (1, [0.0, 0.0, 0.125]), (2, [9.75, -1.0, 4.0])]
BOOKS = [
    [[1.0, 2.0], [3.0, 4.0]],
    [[-1.5, 0.25], [7.0, 8.0]],
]


def test_centroids_round_trip(tmp_path):
    write_centroids(tmp_path / "centroids", CENTROIDS)
    assert read_centroids(tmp_path / "centroids") == CENTROIDS


def test_centroids_read_sorts_by_cid(tmp_path):
    write_centroids(tmp_path / "centroids", list(reversed(CENTROIDS)))
    assert read_centroids(tmp_path / "centroids") == CENTROIDS


def test_codebooks_round_trip(tmp_path):
    write_codebooks(tmp_path / "codebooks", BOOKS)
    assert read_codebooks(tmp_path / "codebooks") == BOOKS


def test_spark_reads_pyarrow_written_dirs(spark, tmp_path):
    write_centroids(tmp_path / "centroids", CENTROIDS)
    write_codebooks(tmp_path / "codebooks", BOOKS)
    cents = spark.read.parquet(str(tmp_path / "centroids"))
    # schema spelling matches the previous Spark write exactly
    assert dict(cents.dtypes) == {"centroid_id": "int", "centroid": "array<double>"}
    got = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        for r in cents.collect()
    )
    assert got == CENTROIDS
    books_df = spark.read.parquet(str(tmp_path / "codebooks"))
    assert dict(books_df.dtypes) == {"ms": "int", "cid": "int", "cv": "array<double>"}
    assert books_df.count() == sum(len(b) for b in BOOKS)


def test_pyarrow_reads_spark_written_dirs(spark, tmp_path):
    # the pre-r14 writer shape: Spark dir with _SUCCESS marker
    path = str(tmp_path / "centroids_spark")
    spark.createDataFrame(
        spark.sparkContext.parallelize(CENTROIDS, 1),
        "centroid_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(path)
    assert read_centroids(path) == CENTROIDS


def test_overwrite_replaces_previous_contents(tmp_path):
    write_centroids(tmp_path / "c", CENTROIDS)
    write_centroids(tmp_path / "c", CENTROIDS[:1])
    assert read_centroids(tmp_path / "c") == CENTROIDS[:1]
