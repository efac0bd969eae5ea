"""DuckDB oracle for ``split_leakage_safe``: recursive-CTE connected
components over exact 3-gram-Jaccard near-dup pairs (same CTE chain as
``dedup_components``'s oracle), then every document inherits its
cluster representative's (min doc_id) content-hash split bucket."""

from __future__ import annotations

from taipei_bi_etl_spark.queries.curation import _SPLIT_B1, _SPLIT_P1, _poly_sql
from taipei_bi_etl_spark.queries.dedup import JACCARD_T

_LEAKAGE_SPLIT_ORACLE = f"""
WITH RECURSIVE shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tok) - 1, 1)),
                i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])) AS shingle
  FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS tok FROM documents)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
), pair_inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM pair_inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_T}
), reach(node, root) AS (
  SELECT d, d FROM (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs) t(d)
  UNION
  SELECT e.b, r.root
  FROM reach r
  JOIN (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs) e ON e.a = r.node
), comp AS (
  SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
), rep AS (
  SELECT d.doc_id, d.source,
         CAST(COALESCE(c.component_id, d.doc_id) AS BIGINT) AS rep_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
), h AS (
  SELECT doc_id AS h_doc_id,
         {_poly_sql("text", _SPLIT_B1, _SPLIT_P1)} % 100 AS b1
  FROM documents
)
SELECT r.doc_id, r.source, r.rep_id,
       CASE WHEN h.b1 < 80 THEN 'train'
            WHEN h.b1 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM rep r JOIN h ON h.h_doc_id = r.rep_id
"""
