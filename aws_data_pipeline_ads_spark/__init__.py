"""aws_data_pipeline_ads_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline `j-cooper/aws-data-pipeline-ads` (see SURVEY.md),
extended with the relational / window / streaming / LLM-data-pipeline
operators a 100 TB ads + training-data platform needs.

Design stance (SURVEY.md §7):
- DataFrame/SQL only; Catalyst + AQE do the physical planning.
- Parquet + Hive-style partitions (`source=`, `extracted_date=`).
- Pandas UDFs only where built-ins genuinely can't express semantics.
- No driver-side collect in any operator.
"""

__version__ = "0.1.0"

from aws_data_pipeline_ads_spark.catalog import TABLES, load_table, register_views
from aws_data_pipeline_ads_spark.session import get_session

__all__ = ["TABLES", "load_table", "register_views", "get_session", "__version__"]
