"""Modern engine API surfaces (Spark 4): Python UDTF (table function),
cogrouped ``applyInPandas`` (two-sided per-key pandas logic), and the
VARIANT semi-structured type.

The reference approximates each with older machinery — its D4 UDF +
downstream UNNEST acts as a UDTF (SURVEY §2.10), its pandasql upsert
(J10, ``/root/reference/tasks/revenue.py:147-167``) is a poor man's
cogrouped merge, and its JSON columns are parsed per-query with
JSON_EXTRACT (F18).  These queries re-express those shapes on the
native surfaces so a user migrating from the reference gets the
first-class forms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from taipei_bi_etl_spark import functions as FN
from taipei_bi_etl_spark.io import read_table
from taipei_bi_etl_spark.queries import query

# ---------------------------------------------------------------------------
# Python UDTF — fixed-width token chunking (1 doc row → N chunk rows).
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32

_CHUNK_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
    FROM documents
)
SELECT doc_id,
       CAST(g.i AS BIGINT) AS chunk_idx,
       CAST(LEAST((g.i + 1) * {CHUNK_TOKENS}, len(toks))
            - g.i * {CHUNK_TOKENS} AS BIGINT) AS chunk_tokens,
       toks[g.i * {CHUNK_TOKENS} + 1] AS first_token,
       toks[LEAST((g.i + 1) * {CHUNK_TOKENS}, len(toks))] AS last_token
FROM t, LATERAL (
    SELECT UNNEST(generate_series(
        0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) AS i
) g
"""


@query(
    "udtf_token_chunks",
    oracle=_CHUNK_ORACLE,
    tags=("modern", "udtf", "curation"),
)
def udtf_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting each document into {CHUNK_TOKENS}-token
    training chunks (1 row in → N rows out) — the context-window
    chunker every pretraining pipeline runs, and the first-class form
    of the reference's UDF+UNNEST fan-out (D4 feature mapping →
    ``explode``, SURVEY §2.10).

    The UDTF yields (chunk_idx, token count, boundary tokens) per
    chunk; the oracle reconstructs the same rows relationally with a
    LATERAL series expansion over the token array.  Python ``split()``
    and the oracle's ``\\s+`` split agree on runs of whitespace.

    Scale: UDTFs run per-partition with no shuffle at all — this plan
    is scan → project → generate, embarrassingly parallel.  The UDTF
    is the slow path vs F.explode of a computed array (row-at-a-time
    Python); it earns its place when chunk logic outgrows expressions
    (tokenizer-aware boundaries, overlap windows) — the plumbing here
    is what the engine guarantees.
    """

    @udtf(
        returnType=(
            "doc_id bigint, chunk_idx bigint, chunk_tokens bigint,"
            " first_token string, last_token string"
        )
    )
    class ChunkDoc:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = (text or "").split()
            for i in range(0, (len(toks) + CHUNK_TOKENS - 1) // CHUNK_TOKENS):
                chunk = toks[i * CHUNK_TOKENS : (i + 1) * CHUNK_TOKENS]
                yield doc_id, i, len(chunk), chunk[0], chunk[-1]

    spark.udtf.register("chunk_doc", ChunkDoc)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        "SELECT c.* FROM __udtf_docs d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )


# ---------------------------------------------------------------------------
# Cogrouped applyInPandas — per-user as-of merge of two event streams.
# ---------------------------------------------------------------------------

_COGROUP_ORACLE = """
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events WHERE event_type = 'click'
), j AS (
    SELECT p.event_id, p.user_id,
           CAST(epoch_ms(p.ts) AS BIGINT) AS purchase_ms,
           c.cents,
           ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
           ) AS rn
    FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT event_id, user_id, purchase_ms, cents AS last_click_cents
FROM j WHERE rn = 1
"""


@query(
    "cogrouped_asof_merge",
    oracle=_COGROUP_ORACLE,
    tags=("modern", "pandas", "J10"),
)
def cogrouped_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: per-user ``pd.merge_asof`` of the
    purchase stream against the click stream — each purchase picks up
    the most recent prior click's value (attribution), purchases with
    no prior click kept with NULL.  This is the two-sided per-key
    escape hatch the pandas family was missing (scalar / grouped /
    mapInPandas / withState are covered elsewhere), and the pandas-
    native twin of ``asof_join_attribution``'s union+window form.

    Determinism: both sides sort by (ts, event_id) — a total order —
    so merge_asof's "last row ≤ key" pick matches the oracle's
    (ts DESC, event_id DESC) rank under timestamp ties.  Cents are
    exact int64; the nullable column rides pandas ``Int64``.

    Scale: ONE cogroup shuffle on user_id moves each user's two slices
    to the same task; state is the user's own rows only.  The oracle's
    relational form fans each purchase across ALL its prior clicks
    before ranking — the cogrouped form never materializes that
    quadratic intermediate.
    """
    e = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", cents.alias("cents")
    )
    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("purchase_ms", T.LongType()),
            T.StructField("last_click_cents", T.LongType()),
        ]
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "purchase_ms", "last_click_cents"]
            )
        left = left.sort_values(["ts", "event_id"], kind="mergesort")
        right = right.sort_values(["ts", "event_id"], kind="mergesort")
        m = pd.merge_asof(
            left[["user_id", "event_id", "ts"]],
            right[["ts", "cents"]],
            on="ts",
            allow_exact_matches=True,
        )
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "purchase_ms": (m["ts"].astype("int64") // 1_000_000),
                "last_click_cents": m["cents"].astype("Int64"),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured type — parse once, extract typed fields.
# ---------------------------------------------------------------------------

# Malformed props parse to NULL (the try_parse_json semantics) and the
# row still counts toward n; untyped events have no rollup group.
_VARIANT_ORACLE = r"""
WITH g AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
                   AND regexp_matches((CASE WHEN json_valid(props) THEN props END)->>'k', '^\s*-?[0-9]+\s*$')
              THEN TRY_CAST((CASE WHEN json_valid(props) THEN props END)->>'k' AS BIGINT) END AS k
  FROM events WHERE event_type IS NOT NULL
)
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(COUNT(*) FILTER (WHERE k > 50) AS BIGINT) AS n_high,
       CAST(COUNT(*) AS BIGINT) AS n
FROM g GROUP BY event_type
""".replace(  # strict-validity gate: dup-key / bare-nan shapes (r06)
    "json_valid(props)", FN.json_valid_strict_sql("props")
)


@query(
    "variant_props_rollup",
    oracle=_VARIANT_ORACLE,
    tags=("modern", "semistructured", "F18"),
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT type: parse the ``props`` JSON once into Spark's binary
    semi-structured VARIANT, then extract typed fields with
    ``variant_get`` — the schema-on-read upgrade over the reference's
    per-query ``JSON_EXTRACT`` string re-parsing (F18,
    ``/root/reference/sql/user_rfe.sql:8``).

    At 100 TB the difference is material: VARIANT stores a parsed
    binary encoding (shredded in parquet where supported), so repeated
    field extraction is a typed offset lookup instead of N string
    parses, and extraction stays inside codegen.  The rollup then
    aggregates normally — parse → extract → aggregate, one shuffle.
    """
    e = read_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    # try_parse_json: malformed props become NULL variants instead of
    # failing the scan (parse_json throws) — the oracle's json_valid CASE
    v = F.try_parse_json("props")
    # TEXT extraction + integral-text contract (functions.int_text):
    # the typed bigint get coerces true->1 and truncates 1.5->1 where
    # the oracle's text TRY_CAST diverges (r05 code review).  The
    # json_strict gate (r07) matches the oracle's strict CASE: a
    # variant-parseable doc failing the textual contract (trailing
    # garbage) carries no k, but still counts toward n.
    from taipei_bi_etl_spark import functions as FN

    k = F.when(
        FN.json_strict(F.col("props")),
        FN.int_text(F.try_variant_get(v, "$.k", "string")),
    )
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
            F.count(F.lit(1)).alias("n"),
        )
    )
