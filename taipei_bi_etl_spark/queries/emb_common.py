"""Shared embedding-validity gate for the similarity / ANN / clustering
/ label-quality families.

The benign sf corpora carry only well-formed 64-dim unit-scale vectors,
but a real embedding table at 100 TB contains writer bugs: NULL
vectors, zero vectors (a failed encode), wrong dimensionality (schema
drift), extreme magnitudes.  The hostile-corpus sweep
(`tools/hostile_corpus_sweep.py`) doctors the table with exactly those
rows; every embedding operator therefore loads the corpus through
:func:`read_embeddings` and mirrors :data:`VALID_SQL` /
:data:`VALID_DIR_SQL` in its DuckDB oracle, so BOTH engines agree on
the validity predicate instead of crashing asymmetrically
(Spark ANSI DIVIDE_BY_ZERO / element_at bounds vs DuckDB
list_inner_product NULL errors — all observed live).

``direction=True`` additionally drops ZERO vectors — any operator that
normalizes (cosine, hyperplane signs) divides by the norm, and a zero
vector has no direction to compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import read_table

EMB_DIM = 64

#: DuckDB twin of the validity predicate (keep textually in sync with
#: read_embeddings).
VALID_SQL = f"embedding IS NOT NULL AND len(embedding) = {EMB_DIM}"
#: "has a direction" = any nonzero element.  NOT expressed via
#: list_inner_product(embedding, embedding) > 0: DuckDB does not
#: guarantee WHERE short-circuit order and list_inner_product ERRORS
#: (not NULLs) on a NULL list — observed live in the hostile sweep.
#: The exists-form also sidesteps x² underflow for subnormal values.
VALID_DIR_SQL = (
    VALID_SQL + " AND len(list_filter(embedding, x -> x <> 0)) > 0"
)


def read_embeddings(
    spark: SparkSession, sf_dir: str, direction: bool = False
) -> DataFrame:
    """The embeddings table with malformed rows filtered out (NULL /
    wrong-dim vectors; with ``direction=True`` also zero vectors)."""
    e = read_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMB_DIM)
    )
    if direction:
        e = e.filter(F.exists("embedding", lambda x: x != 0))
    return e
