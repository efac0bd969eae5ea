"""One-shot refactor: route SF-scaling F.broadcast sites through
scale.bcast_dim and tag bounded-by-construction sites with `# bounded:`.
Run from repo root.  Idempotent-ish: skips lines already converted/tagged.
"""
import re
from pathlib import Path

PKG = Path("taipei_bi_etl_spark")

# (file, substring-of-line, action, reason). action: guard | tag
SITES = [
    ("plans/dag.py", 'dest.join(F.broadcast(victims)', "tag", "victim partition-key list (distinct partition values)"),
    ("plans/dag.py", '.join(F.broadcast(victims), self.key_col, "left_anti")', "tag", "victim partition-key list"),
    ("plans/mango_dag.py", 'F.broadcast(channels),', "tag", "channel lookup (handful of rows)"),
    ("plans/mango_dag.py", 'vol.join(F.broadcast(rps), "country", "left")', "tag", "per-country rates (<= #countries)"),
    ("streaming/jobs.py", 'F.broadcast(customer_dim.select', "guard", None),
    ("tasks/rps.py", 'vol.join(F.broadcast(base), "country", "left")', "tag", "per-country frame"),
    ("tasks/rps.py", '.join(F.broadcast(latest), "country", "left")', "tag", "per-country frame"),
    ("tasks/rps.py", '.join(F.broadcast(cb), "country", "left")', "tag", "per-country frame"),
    ("tasks/rps.py", 'df.crossJoin(F.broadcast(pkg)).crossJoin(F.broadcast(denom))', "tag", "scalar aggregates (1 row each)"),
    ("io.py", 'df.join(F.broadcast(mx)', "tag", "1-row max-date aggregate"),
    ("queries/relational5.py", 'pp.crossJoin(F.broadcast(tot))', "tag", "1-row total"),
    ("queries/relational5.py", 'F.broadcast(winners), s["s_suppkey"]', "tag", "global-argmax rows (ties only)"),
    ("queries/telemetry.py", 'F.broadcast(n), c.c_nationkey == n.n_nationkey', "tag", "nation (25 rows)"),
    ("queries/history.py", 'ev.crossJoin(F.broadcast(d0))', "tag", "1-row min-day aggregate"),
    ("queries/dsir.py", 'cnt.join(F.broadcast(tot))', "tag", "1-row total"),
    ("queries/dsir.py", '.join(F.broadcast(w), "b")', "tag", "128-row bucket-LM weight frame"),
    ("queries/relational.py", '.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")', "tag", "nation (25 rows)"),
    ("queries/relational.py", '.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")', "tag", "region (5 rows)"),
    ("queries/relational.py", '.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)', "tag", "nation (25 rows)"),
    ("queries/relational.py", 'F.broadcast(gk), "o_orderpriority"', "tag", "per-priority percentile aggregate (5 rows)"),
    ("queries/temporal.py", 'axis = F.broadcast(hours).crossJoin(F.broadcast(types))', "tag", "hour grid x event-type domain"),
    ("queries/relational2.py", '.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)', "tag", "nation (25 rows)"),
    ("queries/relational2.py", 'c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)', "tag", "nation (25 rows)"),
    ("queries/relational2.py", 'nested = F.broadcast(r).join(nations', "tag", "region (5 rows)"),
    ("queries/search.py", 'scored = base.join(F.broadcast(stats))', "tag", "1-row corpus stats"),
    ("queries/search.py", 'bucketed = e.join(F.broadcast(stats))', "tag", "1-row min/max aggregate"),
    ("queries/pandas_api.py", 'ev.join(F.broadcast(bounds), "event_type")', "tag", "per-event-type min/max (bounded domain)"),
    ("queries/timegrid.py", 'F.broadcast(hours)', "tag", "hour grid"),
    ("queries/timegrid.py", '.crossJoin(F.broadcast(types))', "tag", "event-type domain"),
    ("queries/timegrid.py", 'v.join(F.broadcast(cuts), "event_type")', "tag", "per-event-type quantile cuts"),
    ("queries/text.py", 'rest.join(F.broadcast(bench), "g", "left")', "guard", None),
    ("queries/curation2.py", 'codes = dims.join(F.broadcast(stats), "dim")', "tag", "per-dim stats (64 rows)"),
    ("queries/curation2.py", 'F.broadcast(q), F.col("vec_id") != F.col("query_id")', "tag", "fixed query set (vec_id < NQ_HAM)"),
    ("queries/curation5.py", 'per_doc.crossJoin(F.broadcast(mx))', "tag", "1-row max aggregate"),
    ("queries/profiling.py", 'tf.join(F.broadcast(df), "term")', "guard", None),
    ("queries/profiling.py", '.crossJoin(F.broadcast(n_docs))', "tag", "1-row count"),
    ("queries/clustering.py", 'assigned.join(F.broadcast(q), "cell")', "tag", "fixed query set"),
    ("queries/sequence.py", 'pairs.join(F.broadcast(sa), "type_a")', "tag", "per-event-type sizes (bounded domain)"),
    ("queries/sequence.py", '.join(F.broadcast(sb), "type_b")', "tag", "per-event-type sizes (bounded domain)"),
    ("queries/sequence.py", '.crossJoin(F.broadcast(totals))', "tag", "1-row total"),
    ("queries/quantization.py", 'sub.join(F.broadcast(codebook), "m")', "tag", "PQ codebook (M*K rows)"),
    ("queries/quantization.py", 'lut = qsub.join(F.broadcast(codebook), "m")', "tag", "PQ codebook (M*K rows)"),
    ("queries/quantization.py", 'encoded.join(F.broadcast(lut), ["m", "code"])', "tag", "ADC LUT (queries x M x K rows)"),
    ("queries/quantization.py", '.join(F.broadcast(qvec), "query_id")', "tag", "fixed query set"),
    ("queries/relational3.py", 'o.join(F.broadcast(c), o.o_custkey == c.c_custkey)', "guard", None),
    ("queries/relational3.py", 'supp.join(F.broadcast(nat)', "tag", "nation (25 rows)"),
    ("queries/graph.py", 'du = F.broadcast(deg.select(F.col("n").alias("u")', "guard", None),
    ("queries/graph.py", 'dv = F.broadcast(deg.select(F.col("n").alias("v")', "guard", None),
    ("queries/graph.py", 'wedges.join(F.broadcast(closer), ["bc"], "inner")', "guard", None),
    ("queries/label_quality.py", 'a.join(F.broadcast(b), F.col("vec_id") != F.col("nbr_id"))', "guard", None),
    ("queries/label_quality.py", 'corpus.crossJoin(F.broadcast(q))', "tag", "fixed query set (vec_id < N_HARD_QUERIES)"),
    ("queries/curation.py", 'totals.crossJoin(F.broadcast(mean_total))', "tag", "1-row mean"),
    ("queries/curation.py", 'per_doc.join(F.broadcast(rates), "source")', "tag", "per-source rates (bounded domain)"),
    ("queries/relational4.py", 'F.broadcast(s),', "guard", None),
    ("queries/relational4.py", '.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])', "tag", "nation (25 rows)"),
    ("queries/relational4.py", '.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])', "tag", "region (5 rows)"),
    ("queries/similarity.py", 'corpus.crossJoin(F.broadcast(q))', "tag", "fixed query set"),
    ("queries/similarity.py", 'a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))', "guard", None),
    ("queries/similarity.py", 'bucketed.join(F.broadcast(q), ["table_id", "bucket"])', "tag", "fixed query set"),
    ("queries/similarity.py", 'pn.crossJoin(F.broadcast(q))', "tag", "fixed query set"),
    ("queries/sketches.py", 'merged.join(F.broadcast(probes), ["d", "bucket"])', "tag", "fixed probe set"),
    ("queries/sketches.py", 'est.crossJoin(F.broadcast(total))', "tag", "1-row total"),
    ("queries/mango_parity.py", 'vol.join(F.broadcast(rps), "country", "left")', "tag", "per-country rates"),
    ("queries/curation4.py", 'uni.join(F.broadcast(vocab), "term", "left")', "tag", "top-K vocab (LIMIT'd)"),
    ("queries/curation4.py", 's.crossJoin(F.broadcast(tot))', "tag", "1-row total"),
    # relational6/7/8 guard + bounded sites
    ("queries/relational6.py", 'li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])', "guard", None),
    ("queries/relational6.py", '.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])', "guard", None),
    ("queries/relational7.py", 's.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])', "tag", "nation (25 rows)"),
    ("queries/relational7.py", 'F.broadcast(r.filter(F.col("r_name") == "ASIA")),', "tag", "region (5 rows)"),
    ("queries/relational7.py", 'pc = cat.join(F.broadcast(asia)', "guard", None),
    ("queries/relational7.py", '.join(F.broadcast(p), pc["l_partkey"] == p["p_partkey"])', "guard", None),
    ("queries/relational7.py", '.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])', "guard", None),
    ("queries/relational7.py", 'per_cust.join(F.broadcast(c), per_cust["o_custkey"] == c["c_custkey"])', "guard", None),
    ("queries/relational7.py", '.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])', "tag", "nation (25 rows)"),
    ("queries/relational7.py", '.crossJoin(F.broadcast(pos))', "tag", "1-row aggregate"),
    ("queries/relational8.py", 'F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),', "tag", "nation (25 rows)"),
    ("queries/relational8.py", 'F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),', "tag", "nation (25 rows)"),
    ("queries/relational8.py", 'li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))', "tag", "nation (25 rows)"),
    ("queries/relational8.py", '.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))', "tag", "region (5 rows)"),
    ("queries/relational8.py", 'li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))', "tag", "nation (25 rows)"),
    ("queries/relational8.py", 'F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"', "guard", None),
    ("queries/relational8.py", '.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))', "guard", None),
    ("queries/relational8.py", 'dominant.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))', "guard", None),
]

GUARD_IMPORT = "from taipei_bi_etl_spark.scale import bcast_dim\n"


def main() -> None:
    by_file: dict[str, list[tuple[str, str, str | None]]] = {}
    for f, sub, action, reason in SITES:
        by_file.setdefault(f, []).append((sub, action, reason))

    for rel, sites in by_file.items():
        path = PKG / rel
        lines = path.read_text().splitlines(keepends=True)
        needs_import = False
        for sub, action, reason in sites:
            hits = [i for i, ln in enumerate(lines) if sub in ln]
            if not hits:
                print(f"MISS {rel}: {sub!r}")
                continue
            for i in reversed(hits):
                ln = lines[i]
                if action == "guard":
                    if "bcast_dim(" in ln:
                        continue
                    lines[i] = ln.replace("F.broadcast(", "bcast_dim(")
                    needs_import = True
                else:
                    if "# bounded:" in ln or (i > 0 and "# bounded:" in lines[i - 1]):
                        continue
                    indent = re.match(r"\s*", ln).group(0)
                    lines.insert(i, f"{indent}# bounded: {reason}\n")
        text = "".join(lines)
        if needs_import and "from taipei_bi_etl_spark.scale import bcast_dim" not in text:
            # insert after the last taipei_bi_etl_spark import near the top
            ls = text.splitlines(keepends=True)
            idx = max(
                (j for j, l in enumerate(ls[:80]) if l.startswith("from taipei_bi_etl_spark")),
                default=None,
            )
            if idx is None:
                idx = max(j for j, l in enumerate(ls[:80]) if l.startswith(("import ", "from ")))
            ls.insert(idx + 1, GUARD_IMPORT)
            text = "".join(ls)
        path.write_text(text)
        print(f"OK   {rel}")


if __name__ == "__main__":
    main()
