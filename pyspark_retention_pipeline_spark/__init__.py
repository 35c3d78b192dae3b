"""pyspark_retention_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query / data-processing
capability surface of the reference repo ``kngsoomin/pyspark-retention-pipeline``
(customer-retention feature engineering + MLlib churn pipeline), extended with
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, event windowing).

Design stance (see SURVEY.md §7):
  * DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten/AQE
    pick physical strategy.
  * No ``collect``/``toPandas`` in engine paths; bounded sinks only.
  * Explicit schemas, broadcast hints for dims, conditional aggregation over
    multi-pass filter+count, approximate variants beside exact ones.
  * Every operator is registered in :mod:`.registry` with a DuckDB oracle SQL
    twin where SQL-expressible.
"""

from .session import get_spark
from .registry import all_queries, all_oracle_sql

__version__ = "0.1.0"

__all__ = ["get_spark", "all_queries", "all_oracle_sql", "__version__"]
