"""Format-breadth tests: ORC as a first-class columnar alternative
through the same sink helpers (pushdown included), and the
unsplittable-codec ingest path (gzip text → one task per file → the
repartition remedy, `io.read_unsplittable_text`)."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from taipei_bi_etl_spark.io import (
    read_table,
    read_unsplittable_text,
    write_partitioned,
)
from tests.conftest import SF_DIR


def test_orc_roundtrip_through_partitioned_sink(spark, tmp_path):
    d = read_table(spark, SF_DIR, "documents").withColumn(
        "utc_date", F.lit("2020-01-01")
    )
    path = str(tmp_path / "orc_sink")
    write_partitioned(d, path, fmt="orc")
    back = spark.read.format("orc").load(path)
    want = sorted(
        (r["doc_id"], r["text"]) for r in d.select("doc_id", "text").collect()
    )
    got = sorted(
        (r["doc_id"], r["text"]) for r in back.select("doc_id", "text").collect()
    )
    assert got == want


def test_orc_scan_pushes_filters(spark, tmp_path):
    d = read_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "orc_flat")
    d.write.mode("overwrite").orc(path)
    q = (
        spark.read.orc(path)
        .filter(F.col("doc_id") < 10)
        .select("doc_id", "source")
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Scan orc" in plan
    assert "LessThan(doc_id,10)" in plan  # predicate reaches the ORC reader
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m and "text" not in m[0]  # column pruning: text not read
    assert q.count() == d.filter(F.col("doc_id") < 10).count()


def test_gzip_jsonl_is_one_task_then_repartitioned(spark, tmp_path):
    rows = [{"id": i, "v": f"x{i}"} for i in range(500)]
    gz = tmp_path / "part-0.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    raw = spark.read.schema("id long, v string").json(str(tmp_path))
    # the unsplittable codec really does collapse to one task
    assert raw.rdd.getNumPartitions() == 1
    fixed = read_unsplittable_text(
        spark, str(tmp_path), fmt="json",
        target_partitions=8, schema="id long, v string",
    )
    assert fixed.rdd.getNumPartitions() == 8
    assert sorted(r["id"] for r in fixed.collect()) == list(range(500))


def test_gzip_many_files_parallelism_matches_file_count(spark, tmp_path):
    for p in range(3):
        with gzip.open(tmp_path / f"part-{p}.jsonl.gz", "wt") as f:
            for i in range(10):
                f.write(json.dumps({"id": p * 10 + i}) + "\n")
    raw = spark.read.schema("id long").json(str(tmp_path))
    # parallelism is bounded by FILE COUNT for unsplittable codecs
    assert raw.rdd.getNumPartitions() == 3
    assert raw.count() == 30
