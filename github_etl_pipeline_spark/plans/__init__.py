from github_etl_pipeline_spark.plans.registry import REGISTRY, QuerySpec, register

# importing these modules populates REGISTRY
from github_etl_pipeline_spark.plans import relational  # noqa: F401
from github_etl_pipeline_spark.plans import domain  # noqa: F401
from github_etl_pipeline_spark.plans import extensions  # noqa: F401
from github_etl_pipeline_spark.plans import curation  # noqa: F401
from github_etl_pipeline_spark.plans import rolling  # noqa: F401
from github_etl_pipeline_spark.plans import shapes  # noqa: F401
from github_etl_pipeline_spark.plans import training  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
