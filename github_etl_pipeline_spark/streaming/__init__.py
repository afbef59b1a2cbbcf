from github_etl_pipeline_spark.streaming.incremental import run_incremental

__all__ = ["run_incremental"]
