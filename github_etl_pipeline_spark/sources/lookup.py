"""Game lookup dimension (reference S7/J1/J2).

The reference loads ``game_id_to_pools.xlsx`` driver-side with pandas and
memoizes it in a module global (etl/transform.py:27-58), then per pool
takes the FIRST matching row's Bet and collects ALL matching Game_ids
(etl/transform.py:213-215).

Spark-first shape: the dimension is tiny (hundreds of rows at fleet
scale), so it is read driver-side, pre-aggregated to exactly one row per
normalized pool key, and broadcast — the fact-side join is then a 1:1
broadcast hash join with no row explosion and no shuffle.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, StringType, DoubleType

from github_etl_pipeline_spark.functions.keys import normalize_pool_id

LOOKUP_SCHEMA = StructType(
    [
        StructField("Game", StringType()),
        StructField("Game_id", StringType()),
        StructField("Pool_id", StringType()),
        StructField("Bet", DoubleType()),
    ]
)

# candidate locations, mirroring etl/transform.py:43-47
_CANDIDATE_SUBPATHS = ("game_id_to_pools.xlsx", "config/game_id_to_pools.xlsx", "data/game_id_to_pools.xlsx")


def _read_xlsx_rows(path: Path) -> list[dict]:
    """Minimal stdlib xlsx reader (zip of XML): first sheet, first row as
    headers. Used when openpyxl is unavailable — the lookup is a simple
    rectangular sheet, which this covers; anything fancier should go
    through pandas.read_excel."""
    import re
    import zipfile
    from xml.etree import ElementTree

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{{{ns['m']}}}t")) for si in root]
        sheet_name = next(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet1\.xml", n)
        )
        root = ElementTree.fromstring(z.read(sheet_name))
        rows: list[dict[int, str]] = []
        for row in root.iter(f"{{{ns['m']}}}row"):
            cells: dict[int, str] = {}
            for c in row.iter(f"{{{ns['m']}}}c"):
                ref = c.attrib.get("r", "A1")
                col = 0
                for ch in ref:
                    if ch.isalpha():
                        col = col * 26 + (ord(ch.upper()) - 64)
                v = c.find(f"{{{ns['m']}}}v")
                raw = v.text if v is not None else None
                if raw is not None and c.attrib.get("t") == "s":
                    raw = shared[int(raw)]
                cells[col - 1] = raw
            rows.append(cells)
    if not rows:
        return []
    headers = rows[0]
    out = []
    for cells in rows[1:]:
        if not cells:
            continue
        out.append({headers.get(i): cells.get(i) for i in headers})
    return out


def load_game_lookup(spark: SparkSession, repo_root: str | Path) -> DataFrame | None:
    """Probe candidate paths for the xlsx and return the raw dimension
    DataFrame (Game, Game_id, Pool_id as strings, Bet double), or None.

    Prefers pandas.read_excel (openpyxl); falls back to a stdlib xlsx
    parser when openpyxl is not installed."""
    for sub in _CANDIDATE_SUBPATHS:
        path = Path(repo_root) / sub
        if not path.exists():
            continue
        try:
            import pandas as pd

            pdf = pd.read_excel(path)
            records = pdf.to_dict("records")
        except ImportError:
            records = _read_xlsx_rows(path)
        rows = []
        for r in records:
            if r.get("Pool_id") is None:
                continue

            def _s(x):
                # integer-valued floats (xlsx numerics) -> '6371' not '6371.0'
                if isinstance(x, float) and x == int(x):
                    return str(int(x))
                if isinstance(x, str) and x.endswith(".0") and x[:-2].isdigit():
                    return x[:-2]
                return str(x)

            rows.append((_s(r.get("Game")), _s(r.get("Game_id")), _s(r.get("Pool_id")), float(r.get("Bet"))))
        return spark.createDataFrame(rows, LOOKUP_SCHEMA)
    return None


def prepare_dim(dim: DataFrame, max_rows: int = 100_000) -> DataFrame:
    """Pre-aggregate the dimension to one row per normalized pool key.

    * ``min_bet``  — Bet of the FIRST row in source order (the reference's
      ``tmp['Bet'].iloc[0]``); source order is pinned with a row index so
      the result is deterministic under Spark parallelism.
    * ``game_ids`` — ALL Game_ids for the key, in source order.

    Pre-aggregating before the fact join avoids fan-out: the join is 1:1,
    so a million-row pool never duplicates into (pool_rows x games) rows.

    DIMENSION-ONLY operator: the source-order pin is a GLOBAL window
    (single partition by construction) — correct and cheap for the
    hundreds-row Excel lookup this models, quadratically wrong for a
    fact table. ``max_rows`` makes misuse loud instead of slow; raise it
    deliberately if a legitimately larger dimension appears.

    Two guards, cheap-first (r4 advice): a call-time ``limit(max_rows
    + 1).count()`` probe — bounded by max_rows+1 rows scanned, raising
    the old ``ValueError`` BEFORE the single-partition window sort ever
    runs on an oversized input — plus the IN-PLAN ``raise_error`` on
    the grouping key, which survives callers that re-derive the plan
    from this function's output without executing the probe path (the
    probe is one extra small Spark job per call; for a lookup dimension
    that is noise).
    """
    probed = dim.limit(int(max_rows) + 1).count()
    if probed > max_rows:
        raise ValueError(
            f"prepare_dim: dimension has >{max_rows} rows; this operator "
            "single-partitions the input to pin source order and is meant "
            "for small lookup dimensions only. Pass max_rows=... to "
            "override deliberately, or pre-aggregate the input."
        )
    w = Window.orderBy(F.monotonically_increasing_id())
    # guard rides on the GROUPING KEY so no amount of column pruning can
    # eliminate it (an _idx-only guard column gets pruned under count())
    guarded_key = F.when(
        F.col("_idx") > int(max_rows),
        F.raise_error(
            f"prepare_dim: dimension has >{max_rows} rows; this operator "
            "single-partitions the input to pin source order and is meant "
            "for small lookup dimensions only. Pass max_rows=... to "
            "override deliberately, or pre-aggregate the input."
        ).cast("string"),
    ).otherwise(normalize_pool_id("Pool_id"))
    indexed = dim.withColumn("_idx", F.row_number().over(w)).withColumn(
        "norm_pool_id", guarded_key
    )
    agg = indexed.groupBy("norm_pool_id").agg(
        F.min_by("Bet", "_idx").alias("min_bet"),
        F.array_sort(F.collect_list(F.struct("_idx", "Game_id"))).alias("_pairs"),
        F.count_distinct("Pool_id").alias("_n_spellings"),
        # the raw source spelling, for the fact-side reference-match gate
        # (functions/keys.py reference_match_expr); unique per group
        # whenever assert_dim_unambiguous holds
        F.min_by("Pool_id", "_idx").alias("dim_pool_id"),
    )
    # J1 edge (SURVEY §4): two source Pool_ids that differ only in zero
    # padding would have made the reference's exact-match-first fallback
    # diverge from the normalized join. Surface it instead of guessing.
    return agg.select(
        "norm_pool_id",
        "dim_pool_id",
        "min_bet",
        F.transform("_pairs", lambda p: p["Game_id"]).alias("game_ids"),
        "_n_spellings",
    )


def assert_dim_unambiguous(dim_agg: DataFrame) -> None:
    bad = dim_agg.where(F.col("_n_spellings") > 1).count()
    if bad:
        raise ValueError(
            f"{bad} normalized pool key(s) map to multiple distinct Pool_id "
            "spellings in the lookup; the reference's exact-match-first join "
            "would be ambiguous here."
        )
