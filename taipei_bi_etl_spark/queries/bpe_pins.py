"""Pinned BPE outputs per test corpus — the oracle side of the
iterative tokenizer queries (VERDICT r01 #1: give the ``bpe_*``
entries deterministic oracles via pinned tables).

BPE training is a data-dependent iterative argmax, far outside ANSI
SQL, but its output IS deterministic (global ties broken by
(count desc, left, right)), so for the FIXED driver corpora the exact
result can be pinned and served as a literal VALUES table.  The oracle
dispatches on ``SUM(length(text))`` of the visible ``documents`` view —
a content discriminator that distinguishes every sf tier (row count
alone does not: sf0.001 and sf0.01 both hold 500 docs) — so one SQL
string is correct at sf0.001 / sf0.01 / sf0.1.

Drift guard: ``tests/test_tokenizer.py::test_bpe_pins_match_live_run``
recomputes the sf0.001 values from scratch each run; if the testdata
ever regenerates, the local suite goes red before the driver does.
Regenerate with ``python -m taipei_bi_etl_spark.queries.bpe_pins``.
"""

from __future__ import annotations

# corpus discriminator: SUM(length(text)) over documents
PIN_KEYS = {"sf0.001": 153156, "sf0.01": 149174, "sf0.1": 1485576}

# (merge_rank, left, right, pair_count) per corpus
MERGE_PINS: dict[str, list[tuple[int, str, str, int]]] = {
    "sf0.001": [
        (1, "e", "r", 4650), (2, "o", "r", 2880), (3, "i", "n", 2858),
        (4, "o", "w", 2763), (5, "s", "t", 2721), (6, "l", "u", 1928),
        (7, "a", "r", 1873), (8, "p", "ar", 1873), (9, "m", "er", 1824),
        (10, "a", "t", 1806),
    ],
    "sf0.01": [
        (1, "e", "r", 4568), (2, "i", "n", 2760), (3, "o", "w", 2747),
        (4, "o", "r", 2696), (5, "s", "t", 2676), (6, "m", "er", 1852),
        (7, "a", "t", 1845), (8, "l", "u", 1831), (9, "a", "r", 1758),
        (10, "p", "ar", 1758),
    ],
    "sf0.1": [
        (1, "e", "r", 45089), (2, "i", "n", 27190), (3, "o", "r", 27095),
        (4, "s", "t", 27060), (5, "o", "w", 27044), (6, "t", "a", 18248),
        (7, "l", "u", 18239), (8, "m", "er", 18174), (9, "a", "r", 18111),
        (10, "p", "ar", 18111),
    ],
}

# (source, total_words, total_pieces, pieces_per_word) per corpus
ENCODE_PINS: dict[str, list[tuple[str, int, int, float]]] = {
    "sf0.001": [
        ("src0", 1533, 5468, 3.566862), ("src1", 1441, 5193, 3.603747),
        ("src10", 1376, 4935, 3.586483), ("src11", 1426, 5096, 3.573633),
        ("src12", 1479, 5336, 3.607843), ("src13", 1269, 4549, 3.584712),
        ("src14", 1657, 5994, 3.617381), ("src15", 1332, 4761, 3.574324),
        ("src16", 1414, 5089, 3.59901), ("src17", 1314, 4775, 3.633942),
        ("src18", 1271, 4553, 3.582219), ("src19", 1369, 5029, 3.673484),
        ("src2", 1267, 4562, 3.600631), ("src3", 1560, 5560, 3.564103),
        ("src4", 1316, 4700, 3.571429), ("src5", 1216, 4453, 3.662007),
        ("src6", 1466, 5205, 3.550477), ("src7", 1212, 4343, 3.583333),
        ("src8", 1632, 5903, 3.617034), ("src9", 1389, 5037, 3.62635),
    ],
    "sf0.01": [
        ("src0", 1435, 5216, 3.634843), ("src1", 1540, 5620, 3.649351),
        ("src10", 1303, 4677, 3.589409), ("src11", 1522, 5507, 3.618265),
        ("src12", 1272, 4541, 3.569969), ("src13", 1553, 5556, 3.577592),
        ("src14", 1318, 4737, 3.594082), ("src15", 1298, 4641, 3.575501),
        ("src16", 1351, 4928, 3.647668), ("src17", 1373, 4872, 3.548434),
        ("src18", 1364, 4977, 3.648827), ("src19", 1147, 4134, 3.604185),
        ("src2", 1407, 5087, 3.615494), ("src3", 1384, 5001, 3.613439),
        ("src4", 1294, 4643, 3.588099), ("src5", 1329, 4783, 3.598947),
        ("src6", 1266, 4589, 3.624803), ("src7", 1507, 5441, 3.610484),
        ("src8", 1136, 4147, 3.650528), ("src9", 1366, 4921, 3.602489),
    ],
    "sf0.1": [
        ("src0", 13298, 48287, 3.631148), ("src1", 13597, 48874, 3.594469),
        ("src10", 13608, 49275, 3.621032), ("src11", 13196, 47695, 3.614353),
        ("src12", 14224, 51181, 3.598214), ("src13", 14214, 51347, 3.612424),
        ("src14", 12823, 46076, 3.593231), ("src15", 13097, 47202, 3.604031),
        ("src16", 13541, 48513, 3.582675), ("src17", 13572, 48742, 3.591365),
        ("src18", 13119, 47234, 3.600427), ("src19", 13451, 48504, 3.605977),
        ("src2", 13727, 49382, 3.597436), ("src3", 13567, 48852, 3.600796),
        ("src4", 13431, 48428, 3.605688), ("src5", 14373, 51704, 3.5973),
        ("src6", 13580, 48844, 3.59676), ("src7", 12604, 45536, 3.612821),
        ("src8", 14399, 51853, 3.601153), ("src9", 13283, 47982, 3.612286),
    ],
}


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def merges_oracle() -> str:
    rows = []
    for sf, pins in MERGE_PINS.items():
        key = PIN_KEYS[sf]
        rows += [
            f"({key}, {rank}, {_sql_str(l)}, {_sql_str(r)}, {cnt})"
            for rank, l, r, cnt in pins
        ]
    values = ",\n  ".join(rows)
    return f"""
WITH pins(corpus_chars, merge_rank, "left", "right", pair_count) AS (
  VALUES
  {values}
)
SELECT CAST(merge_rank AS INT) AS merge_rank,
       "left", "right",
       CAST(pair_count AS BIGINT) AS pair_count
FROM pins
WHERE corpus_chars = (SELECT SUM(length(text)) FROM documents)
"""


def encode_oracle() -> str:
    rows = []
    for sf, pins in ENCODE_PINS.items():
        key = PIN_KEYS[sf]
        rows += [
            f"({key}, {_sql_str(src)}, {tw}, {tp}, {ppw})"
            for src, tw, tp, ppw in pins
        ]
    values = ",\n  ".join(rows)
    return f"""
WITH pins(corpus_chars, source, total_words, total_pieces,
          pieces_per_word) AS (
  VALUES
  {values}
)
SELECT source,
       CAST(total_words AS BIGINT) AS total_words,
       CAST(total_pieces AS BIGINT) AS total_pieces,
       CAST(pieces_per_word AS DOUBLE) AS pieces_per_word
FROM pins
WHERE corpus_chars = (SELECT SUM(length(text)) FROM documents)
"""


if __name__ == "__main__":
    # regeneration helper: print fresh pin literals for every sf tier
    import json

    from pyspark.sql import SparkSession

    from taipei_bi_etl_spark.io import read_table
    from taipei_bi_etl_spark.queries.tokenizer import (
        bpe_encode_apply,
        bpe_train_merges,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    out = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        docs = read_table(spark, d, "documents")
        from pyspark.sql import functions as F

        key = docs.agg(F.sum(F.length("text"))).collect()[0][0]
        tm = [
            (r.merge_rank, r.left, r.right, r.pair_count)
            for r in bpe_train_merges(spark, d).orderBy("merge_rank").collect()
        ]
        en = [
            (r.source, r.total_words, r.total_pieces, r.pieces_per_word)
            for r in bpe_encode_apply(spark, d).orderBy("source").collect()
        ]
        out[sf] = {"key": key, "merges": tm, "encode": en}
    print(json.dumps(out, indent=1))
