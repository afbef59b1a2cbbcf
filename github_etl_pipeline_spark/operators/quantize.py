"""Embedding quantization — the storage/bandwidth lever a 100-TB vector
corpus needs before anything else (a float32 embedding table is 4 bytes
per dim per row; int8 asymmetric quantization is 1 byte + two scalars,
a 4x scan-volume cut for ANN candidate generation).

Beyond-reference extension surface (SURVEY §8); the reference has no
vector columns at all.

Design: per-vector (asymmetric, min/max) affine quantization in PURE
column expressions — ``F.array_min``/``F.array_max`` for the range,
``F.transform`` + ``floor`` for the codes. No UDF, no shuffle: the
operator is a projection, so it fuses into whatever scan or join it
decorates and whole-stage codegen keeps it JVM-side.

Determinism: codes use ``floor((x - vmin) * 255 / range)`` — floor, not
round, because IEEE divide/multiply of identical doubles is engine-exact
while round-half-up vs round-half-even at representation boundaries is
not. The x == vmax endpoint lands exactly on 255 (the product is
exactly 255.0 * 1.0), so no clamp is needed for in-range inputs;
constant vectors (range == 0) quantize to all-zero codes by convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INT8_LEVELS = 255


def as_double(vec: Column) -> Column:
    """Promote a float32 array to double BEFORE any arithmetic: Spark
    evaluates float-float ops in float32 while the DuckDB oracle promotes
    to double — identical results require identical operand widths."""
    return F.transform(vec, lambda x: x.cast("double"))


def quantize_codes(vec: Column) -> Column:
    """array<int> of 0..255 codes for one float-array column."""
    vd = as_double(vec)
    vmin = F.array_min(vd)
    rng = F.array_max(vd) - vmin
    return F.transform(
        vd,
        lambda x: F.when(rng > 0, F.floor((x - vmin) * INT8_LEVELS / rng))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def dequantize_expr(codes: Column, vmin: Column, vmax: Column) -> Column:
    """array<double> reconstruction: vmin + code * (vmax - vmin) / 255."""
    rng = vmax - vmin
    return F.transform(codes, lambda c: vmin + c.cast("double") * rng / INT8_LEVELS)


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, vmin, vmax, codes, max_abs_err_q) per vector.

    ``max_abs_err_q`` is the worst reconstruction error QUANTIZED to
    integer 1e-6 steps (floor) — the per-vector quality gate, kept
    integer so cross-engine comparison is exact. The theoretical bound
    for 255-level floor quantization is one full step, range/255.
    """
    v = as_double(F.col(vec_col))
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    codes = quantize_codes(F.col(vec_col))
    recon = dequantize_expr(codes, vmin, vmax)
    err = F.array_max(F.zip_with(v, recon, lambda x, r: F.abs(x - r)))
    return emb.select(
        F.col(id_col),
        vmin.cast("double").alias("vmin"),
        vmax.cast("double").alias("vmax"),
        codes.alias("codes"),
        F.floor(err * 1_000_000).cast("long").alias("max_abs_err_q"),
    )
