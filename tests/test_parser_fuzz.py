"""Hypothesis fuzz: the Spark lenient parser vs a from-spec Python
reimplementation of the reference tokenizer (etl/transform.py:74-95
semantics, re-derived: split on whitespace, int first token else drop,
add int third token when present)."""

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from github_etl_pipeline_spark.sources.pol import parse_pol_lines

token = st.one_of(
    st.integers(-10000, 10000).map(str),
    st.text(alphabet="abcXYZ.,-_", min_size=1, max_size=6),
    st.just("007"),
    st.just("+5"),
    st.just("1e3"),
)
line = st.lists(token, min_size=0, max_size=4).map(lambda ts: "  ".join(ts))


def ref_parse(lines):
    out = []
    for l in lines:
        parts = l.strip().split()
        if not parts:
            continue
        try:
            v = int(parts[0])
        except ValueError:
            continue
        if len(parts) >= 3:
            try:
                v += int(parts[2])
            except ValueError:
                pass
        out.append(v)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(line, min_size=0, max_size=30))
def test_parser_matches_reference_spec(spark, lines):
    df = spark.createDataFrame(
        [(l, "x/Pool_1_2.pol", "Pool_1_2.pol", "x", "x", 1, None) for l in lines]
        or [("", "x/Pool_1_2.pol", "Pool_1_2.pol", "x", "x", 1, None)],
        "value string, source_file string, file_name string, folder_path string, "
        "parent_folder string, file_size long, file_mtime timestamp",
    )
    got = [r.game_win for r in parse_pol_lines(df).collect()]
    expect = ref_parse(lines if lines else [""])
    assert Counter(got) == Counter(expect), (lines, got, expect)
