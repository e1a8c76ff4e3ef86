"""Reference-parity ETL pipeline: envelope transforms, quality layer,
partitioned sink, continue-on-error runner."""

from aws_data_pipeline_ads_spark.pipeline.envelope import (
    add_envelope,
    transform_crm,
    transform_marketing,
    transform_sales,
    transform_source,
)
from aws_data_pipeline_ads_spark.pipeline.runner import SourceResult, run_pipeline
from aws_data_pipeline_ads_spark.pipeline.sink import write_partitioned, write_run_summary

__all__ = [
    "add_envelope",
    "transform_marketing",
    "transform_sales",
    "transform_crm",
    "transform_source",
    "run_pipeline",
    "SourceResult",
    "write_partitioned",
    "write_run_summary",
]
