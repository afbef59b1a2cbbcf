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


# ---------------------------------------------------------------------------
# Perceptual average-hash (aHash) for media dedup — real algorithm over the
# deterministic fake decode (the documented codec stub)
# ---------------------------------------------------------------------------
AHASH_BITS = 48  # 3 md5 digests x 16 bytes = 48 "pixels" (pigeonhole-bandable)
AHASH_BANDS = 4


def ahash_pixel_digests(text_col):
    """The fake-decoded 'grayscale pixels': 3 md5 digests of the payload
    with a counter suffix, 16 bytes each — deterministic, engine-portable
    (DuckDB computes the identical hex). A real decoder would replace
    this with an 8x8 downscale; everything downstream (mean threshold,
    bit packing, Hamming banding) is the actual aHash algorithm."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [F.md5(F.concat(c, F.lit(str(d)))) for d in range(AHASH_BITS // 16)]


def media_ahash(media_text: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(media_id, ahash): 48-bit perceptual average-hash — bit j set iff
    pixel_j >= mean, tested in exact integers as pixel_j * 48 >= sum
    (no float mean, no rounding ambiguity). Pure generated expressions:
    two projections (digests, then pixels+pack), no UDF, no shuffle."""
    h = media_text.select(
        F.col(id_col).alias("media_id"),
        *[d.alias(f"_h{i}") for i, d in enumerate(ahash_pixel_digests(text_col))],
    )
    pixels = [
        F.conv(F.substring(f"_h{d}", 2 * i + 1, 2), 16, 10).cast("long")
        for d in range(AHASH_BITS // 16)
        for i in range(16)
    ]
    p = h.select("media_id", *[px.alias(f"_p{j}") for j, px in enumerate(pixels)])
    total = sum((F.col(f"_p{j}") for j in range(AHASH_BITS)), F.lit(0))
    s = p.withColumn("_total", total)
    packed = sum(
        (
            F.when(F.col(f"_p{j}") * AHASH_BITS >= F.col("_total"), F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j in range(AHASH_BITS)
        ),
        F.lit(0),
    )
    return s.select("media_id", packed.cast("long").alias("ahash"))


def media_dup_pairs(
    media_text: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual near-dup media pairs: band the 48-bit aHash into 4
    12-bit keys (pigeonhole: Hamming <= 3 pairs agree on >= 1 band —
    LOSSLESS for the threshold), hash-join bands, verify with
    bit_count(xor) exactly. Same scale shape as the SimHash text pairs:
    the shuffle carries (band, key) rows, never all pairs."""
    ah = media_ahash(media_text, text_col, id_col)
    bits_per_band = AHASH_BITS // AHASH_BANDS
    mask = (1 << bits_per_band) - 1
    keyed = ah.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("ahash", b * bits_per_band)
                        .bitwiseAND(mask)
                        .alias("bkey"),
                    )
                    for b in range(AHASH_BANDS)
                ]
            )
        ).alias("_bk"),
    ).select("media_id", "ahash", "_bk.band", "_bk.bkey")
    a = keyed.select(
        F.col("media_id").alias("id_a"), F.col("ahash").alias("ha"), "band", "bkey"
    )
    b = keyed.select(
        F.col("media_id").alias("id_b"), F.col("ahash").alias("hb"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.where(hamming <= max_hamming).select(
        "id_a", "id_b", hamming.cast("long").alias("hamming")
    )
