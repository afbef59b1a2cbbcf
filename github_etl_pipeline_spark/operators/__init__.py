from github_etl_pipeline_spark.operators.classify import (
    tag_expr,
    is_flat_expr,
    max_multiplier_expr,
)
from github_etl_pipeline_spark.operators.kpis import pool_kpis, pool_distribution
from github_etl_pipeline_spark.operators.rollup import aggregated_summary

__all__ = [
    "tag_expr",
    "is_flat_expr",
    "max_multiplier_expr",
    "pool_kpis",
    "pool_distribution",
    "aggregated_summary",
]
