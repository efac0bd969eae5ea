"""Adjust task (``/root/reference/tasks/adjust.py:17-46``): the
ad-tracker hierarchy networks → campaigns → adgroups → creatives,
recursively flattened with ancestor-prefixed fields (S7,
``utils/marshalling.py:137-183``; config ``configs/adjust.py:12-13``).

The reference walks the nested JSON in a Python loop; here the payload
parses once (``from_json`` with an explicit nested schema) and flattens
with chained ``explode_outer`` — each level is map-side, no shuffle, and
a node with no children still emits its ancestor row (outer semantics
match the reference's leaf-emission fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from taipei_bi_etl_spark.tasks.base import EtlTask


_CREATIVE = T.StructType(
    [T.StructField("name", T.StringType()), T.StructField("token", T.StringType())]
)
_ADGROUP = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("creatives", T.ArrayType(_CREATIVE)),
    ]
)
_CAMPAIGN = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("adgroups", T.ArrayType(_ADGROUP)),
    ]
)
_NETWORK = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("campaigns", T.ArrayType(_CAMPAIGN)),
    ]
)
ADJUST_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField(
            "result_set",
            T.StructType([T.StructField("networks", T.ArrayType(_NETWORK))]),
        )
    ]
)


def flatten_adjust(raw_json: DataFrame, json_col: str = "payload") -> DataFrame:
    """One row per creative (or per deepest existing ancestor), columns
    ``{level}_name`` / ``{level}_token`` for all four levels."""
    parsed = raw_json.withColumn(
        "_p", F.from_json(F.col(json_col), ADJUST_PAYLOAD_SCHEMA)
    )
    n = parsed.select(
        F.explode_outer("_p.result_set.networks").alias("network")
    )
    c = n.select(
        F.col("network.name").alias("network_name"),
        F.col("network.token").alias("network_token"),
        F.explode_outer("network.campaigns").alias("campaign"),
    )
    g = c.select(
        "network_name",
        "network_token",
        F.col("campaign.name").alias("campaign_name"),
        F.col("campaign.token").alias("campaign_token"),
        F.explode_outer("campaign.adgroups").alias("adgroup"),
    )
    r = g.select(
        "network_name",
        "network_token",
        "campaign_name",
        "campaign_token",
        F.col("adgroup.name").alias("adgroup_name"),
        F.col("adgroup.token").alias("adgroup_token"),
        F.explode_outer("adgroup.creatives").alias("creative"),
    )
    return r.select(
        "network_name",
        "network_token",
        "campaign_name",
        "campaign_token",
        "adgroup_name",
        "adgroup_token",
        F.col("creative.name").alias("creative_name"),
        F.col("creative.token").alias("creative_token"),
    )


class AdjustTask(EtlTask):
    def transform_adjust(self, adjust: DataFrame) -> DataFrame:
        return flatten_adjust(adjust)
