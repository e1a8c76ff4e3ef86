"""Source layer: config-driven registry + connectors feeding DataFrames."""

from aws_data_pipeline_ads_spark.sources.registry import (
    PipelineConfig,
    SourceConfig,
    default_config,
    load_config,
)

__all__ = ["PipelineConfig", "SourceConfig", "default_config", "load_config"]
