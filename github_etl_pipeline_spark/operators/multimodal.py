"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The decode step itself is STUBBED — the real image/audio libraries are
not in this environment — but everything Spark-side is real and tested:
the schema contract, the ``mapInPandas`` batch shape, partition-count
preservation, and a deterministic fake decoder so downstream feature
columns have verifiable values.

Scale notes: binary payloads ride in the DataFrame as parquet binary
columns; per-batch processing (Arrow RecordBatch in, RecordBatch out)
keeps the Python boundary amortized. Re-partition by expected payload
size before heavy decode (`spark.sql.files.maxPartitionBytes` governs
scan-side splits; decode-side use ``df.repartition`` on row-count-
balanced keys).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png | wav | mp4 | ...
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feat_mean", LongType(), True),  # fake-decoded feature
        StructField("feat_dim", IntegerType(), True),
    ]
)


def decode_image(content: bytes, fmt: str | None):  # pragma: no cover - stub
    """Real decoder entry point — requires an image library not present in
    this environment. The Spark plumbing calls ``fake_decode`` instead
    unless a decoder is injected."""
    raise NotImplementedError(
        "image decoding requires an imaging library; inject a decoder or "
        "use fake_decode for plumbing tests"
    )


def fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode+feature-extract: (feature mean,
    feature dim) derived from the payload bytes. Lets every downstream
    assertion be exact while the real decoder is absent."""
    import hashlib

    if content is None:
        return (0, 0)
    digest = hashlib.md5(content).digest()
    return (int.from_bytes(digest[:4], "big"), len(content) % 512 + 1)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over the media table. Arrow batches
    flow in/out; one output row per input row; decode stubbed behind
    ``fake_decode`` (see module docstring).

    The decode logic is re-declared LOCALLY so cloudpickle ships it by
    value: a module-level reference would make every Python worker import
    this package, which fails when the driver's cwd isn't the repo root
    (the driver-contract deployment mode). Kept in sync with
    ``fake_decode`` by test_extensions.test_multimodal_plumbing."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        def _fake_decode(content):
            if content is None:
                return (0, 0)
            digest = hashlib.md5(content).digest()
            return (int.from_bytes(digest[:4], "big"), len(content) % 512 + 1)

        for pdf in batches:
            feat = pdf["content"].map(lambda c: _fake_decode(bytes(c) if c is not None else None))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda c: len(c) if c is not None else 0),
                    "content_hash": pdf["content"].map(
                        lambda c: hashlib.md5(bytes(c)).hexdigest() if c is not None else None
                    ),
                    "feat_mean": feat.map(lambda t: t[0]),
                    "feat_dim": feat.map(lambda t: t[1]),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into the frame
    timestamps that a real decoder would extract (sequence expression —
    JVM-side), with the per-frame decode left to ``extract_features``.
    Demonstrates the fan-out shape without the codec."""
    return (
        media.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            "format",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def audio_window_plan(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio analysis-window PLAN: (window_start_ms, window_end_ms) rows
    per audio item at ``hop_ms`` stride — the STFT/feature-window fan-out
    shape, decode left to the batch UDF. Windows start while there is at
    least one ms of audio left; the final window may be short (clamped
    end), mirroring ``curation.chunk_documents``'s token semantics."""
    return (
        media.where(F.col("kind") == "audio")
        .where(F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0))
        .select(
            "media_id",
            "format",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(hop_ms))
            ).alias("window_start_ms"),
            F.col("duration_ms"),
        )
        .select(
            "media_id",
            "format",
            "window_start_ms",
            F.least(
                F.col("window_start_ms") + window_ms, F.col("duration_ms")
            ).alias("window_end_ms"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("content", BinaryType(), True),
        StructField("content_hash", StringType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas image resize with the decode/encode step stubbed
    behind a deterministic fake (md5 of payload + target geometry stands
    in for the resampled pixels — same contract as ``extract_features``):
    the Spark-side shape is real — Arrow batches, one row per image,
    binary out, geometry columns typed. Swap ``_fake_resize`` for a real
    codec via the same closure seam."""
    w, h = int(width), int(height)

    def run(batches):
        import hashlib

        import pandas as pd

        def _fake_resize(content):
            if content is None:
                return None
            return hashlib.md5(bytes(content) + f":{w}x{h}".encode()).digest()

        for pdf in batches:
            out_content = pdf["content"].map(_fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "content": out_content,
                    "content_hash": out_content.map(
                        lambda c: hashlib.md5(c).hexdigest() if c is not None else None
                    ),
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)
