"""taipei_bi_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
mozilla-tw/taipei-bi-etl (see SURVEY.md), re-expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, partition-aware
sinks, and large-scale training-data operators (dedup, similarity
search, text analysis) designed for 100 TB-class inputs.
"""

__version__ = "0.1.0"
