#!/usr/bin/env python
"""Plan audit: dump `.explain(formatted)` for the engine's load-bearing plans
and assert the physical properties we designed for (pushdown, broadcast,
whole-stage codegen, partial aggregation). Output → PLANS.md.

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from crawlspark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    import __spark_entry__ as em

    sections: list[tuple[str, str, list[str]]] = []

    # 1. filter + projection pushdown into the parquet scan (S1/S3/S10)
    q = em.q_s01_filter_pushdown(spark, SF)
    p = fmt(q)
    checks = []
    checks.append(("PushedFilters carry the predicate", "PushedFilters" in p and "event_type" in p))
    checks.append(("ReadSchema pruned to 4 cols", "ReadSchema" in p and "props" not in p.split("ReadSchema")[1][:400]))
    checks.append(("whole-stage codegen", "codegen id" in p))
    sections.append(("S1: filter/projection pushdown (events scan)", p, checks))

    # 2. broadcast join for small dims (S7 / robots pattern)
    q = em.q_s07_coalesce_fallback(spark, SF)
    p = fmt(q)
    sections.append(
        ("S7: small-dim broadcast join", p,
         [("BroadcastHashJoin chosen", "BroadcastHashJoin" in p)])
    )

    # 3. partial (map-side) aggregation on the Q1-shape agg (S23)
    q = em.q_s23_agg_q1(spark, SF)
    p = fmt(q)
    sections.append(
        ("S23: aggregate with map-side partial agg", p,
         [("HashAggregate partial+final", p.count("HashAggregate") >= 2)])
    )

    # 4. canonicalization stays in one codegen'd projection
    from crawlspark.canonical import canonicalize_expr

    urls = spark.createDataFrame([("https://A.example:443/x/../p/1#f",)], ["url"])
    q = urls.select(canonicalize_expr(F.col("url")).alias("c"))
    p = fmt(q)
    sections.append(
        ("Canonicalizer: single JVM projection (no Python)", p,
         [("whole-stage codegen", "codegen id" in p),
          ("no Python/Arrow operator", "MapInPandas" not in p and "ArrowEval" not in p and "BatchEvalPython" not in p)])
    )

    # 5. seen anti-join shape: broadcast of small seen keys
    from crawlspark.seen import split_new_vs_seen

    batch = spark.range(1000).select(
        F.col("id").alias("url_hash"), F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    seen = spark.range(100).select(
        F.col("id").alias("url_hash"), F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.col("id").alias("surrogate_key"), F.lit(0).alias("first_round"),
    )
    q = split_new_vs_seen(batch, seen, None)
    p = fmt(q)
    sections.append(
        ("Seen-set exact confirm: join on url_hash", p,
         [("join present", "Join" in p)])
    )

    # 6. extraction: exactly one Arrow/Python stage
    from crawlspark import synth
    from crawlspark.extract import extract_pages

    rows = [synth.page_row(i, 3) for i in range(4)]
    df = spark.createDataFrame([(r["url"], r["html"], "p") for r in rows],
                               ["url", "html", "provider"])
    q = extract_pages(df, synth.golden_fields(), synth.LANDING_PAGE_FIELD)
    p = fmt(q)
    sections.append(
        ("Extraction: one MapInPandas stage", p,
         [("exactly one MapInPandas operator", p.count("(2) MapInPandas") >= 1 and p.count("MapInPandas (") == 1)])
    )

    # 7. minhash LSH: bucket-grouped candidates, no self-join of the
    #    signature subtree, no cartesian anywhere
    from crawlspark.textops import ann_bruteforce_topk, embedding_near_dup_pairs, minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = minhash_lsh_pairs(docs, jaccard_threshold=0.8)
    p = fmt(q)
    analyzed = q._jdf.queryExecution().analyzed().toString()
    sections.append(
        ("MinHash LSH: bucket groupBy candidates (no self-join, no cartesian)", p,
         [("no CartesianProduct / BroadcastNestedLoop on the candidate path",
           "CartesianProduct" not in p),
          ("signature subtree evaluated once (single ObjectHashAggregate/"
           "HashAggregate pair over the banded explode)", "Generate" in p),
          ("no forced broadcast of the candidate-pair set (no hint in the "
           "analyzed plan; O(near-dups) is not broadcast-sized at 10^10 docs)",
           "ResolvedHint" not in analyzed)])
    )

    # 8. ANN top-k: TakeOrderedAndProject, no global Window
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = ann_bruteforce_topk(emb, 0, 10)
    p = fmt(q)
    sections.append(
        ("ANN brute-force top-k: TakeOrderedAndProject, no Window", p,
         [("TakeOrderedAndProject", "TakeOrderedAndProject" in p),
          ("no Window operator", "Window" not in p)])
    )

    # 9. embedding near-dup: banded bucket aggregation, no n² join
    q = embedding_near_dup_pairs(emb, threshold=0.999)
    p = fmt(q)
    analyzed = q._jdf.queryExecution().analyzed().toString()
    sections.append(
        ("Embedding near-dup: banded sketches, bucket agg, no cartesian", p,
         [("no CartesianProduct/BroadcastNestedLoop", "CartesianProduct" not in p
           and "BroadcastNestedLoop" not in p),
          ("posexplode of band sketches present", "Generate" in p),
          ("no forced broadcast of the candidate-pair set",
           "ResolvedHint" not in analyzed)])
    )

    # 10. distributed bloom build: executor-side cogroup, no driver collect
    from crawlspark.seen import distributed_bloom_update

    hashes = spark.range(1000).select(F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    q = distributed_bloom_update(hashes, None, 1 << 16, 5, 32)
    p = fmt(q)
    sections.append(
        ("Bloom build: per-bucket cogroup on executors", p,
         [("FlatMapCoGroupsInPandas operator", "FlatMapCoGroupsInPandas" in p)])
    )

    # 11. routed bloom probe: per-bucket cogroup, no whole-filter broadcast
    from crawlspark.seen import bloom_probe_routed

    bloom_df = distributed_bloom_update(hashes, None, 1 << 16, 5, 32)
    keys = spark.range(500).select(F.xxhash64(F.col("id").cast("string")).alias("h"))
    q = bloom_probe_routed(keys, bloom_df, 32)
    p = fmt(q)
    sections.append(
        ("Bloom probe (scale path): per-bucket cogroup, filter never broadcast", p,
         [("FlatMapCoGroupsInPandas operator", "FlatMapCoGroupsInPandas" in p),
          ("no broadcast of the bitmap table", "BroadcastExchange" not in p)])
    )

    # 12. batch k-NN join: per-query window (never a global single-partition
    #     window), query set broadcast (a true small dim)
    from crawlspark.textops import ann_knn_join_bruteforce

    q = ann_knn_join_bruteforce(emb, emb.filter(F.col("vec_id") < 8), k=5)
    p = fmt(q)
    sections.append(
        ("Batch k-NN join: per-query window, broadcast query dim", p,
         [("window partitioned by q_id (no global window)",
           "windowspecdefinition(q_id" in p),
          ("WindowGroupLimit pushes the rank<=k limit below the sort",
           "WindowGroupLimit" in p),
          ("query set broadcast", "BroadcastExchange" in p or "BroadcastNestedLoop" in p)])
    )

    # 13. cuckoo build/probe (deletable seen filter): same per-bucket cogroup
    #     shape as bloom — table never collected or broadcast
    from crawlspark.seen import cuckoo_probe_routed, distributed_cuckoo_update

    ck_df = distributed_cuckoo_update(hashes, None, 1 << 12, 4, 32)
    p = fmt(ck_df)
    checks = [("FlatMapCoGroupsInPandas operator", "FlatMapCoGroupsInPandas" in p)]
    q = cuckoo_probe_routed(keys, ck_df, 32)
    p2 = fmt(q)
    checks += [
        ("probe is a per-bucket cogroup", "FlatMapCoGroupsInPandas" in p2),
        ("no broadcast of the fingerprint table", "BroadcastExchange" not in p2),
    ]
    sections.append(
        ("Cuckoo filter (deletable seen prefilter): build + probe cogroups", p + "\n" + p2, checks)
    )

    # 14. pipeline_curate: the composed curation chain — final plan reads the
    #     gated corpus from cache and cluster labels from the checkpoint; no
    #     file scan is recomputed across stage boundaries
    q = em.q_pipeline_curate(spark, SF)
    p = fmt(q)
    # ("Scan parquet" DOES appear in the formatted text — inside the
    # InMemoryRelation's one-time cache-FILL plan, already executed during the
    # clusters stage; the live operators are the cache scan + checkpoint RDD.
    # Structural check: every parquet scan line is indented strictly deeper
    # than the InMemoryRelation node, i.e. inside its fill subtree.)
    tree = p.split("\n(1)")[0].splitlines()
    rel_indent = min(
        (len(l) - len(l.lstrip(" :+-"))) for l in tree if "InMemoryRelation" in l
    )
    scans_inside = all(
        (len(l) - len(l.lstrip(" :+-"))) > rel_indent
        for l in tree
        if "Scan parquet" in l
    )
    sections.append(
        ("pipeline_curate: composed gates→dedup→clusters→tokens, one connected plan", p,
         [("survivor corpus read from cache (InMemoryTableScan)", "InMemoryTableScan" in p),
          ("cluster labels read from the localCheckpoint RDD, not recomputed",
           "ExistingRDD" in p),
          ("every parquet scan sits inside the one-time cache-fill subtree",
           scans_inside),
          ("no cartesian anywhere", "CartesianProduct" not in p
           and "BroadcastNestedLoop" not in p)])
    )

    # 15. IVF ANN: posting-list assignment is a pure projection (no shuffle,
    #     no join, no Python); the probe side is a broadcast
    from crawlspark.textops import ann_ivf_topk

    q = ann_ivf_topk(emb, query_vec_id=0, k=10)
    p = fmt(q)
    sections.append(
        ("IVF ANN: projection-only list assignment, broadcast probe", p,
         [("no Python/Arrow operator", "MapInPandas" not in p and "ArrowEval" not in p
           and "BatchEvalPython" not in p),
          ("candidate join is a broadcast HASH join on list_id",
           "BroadcastHashJoin" in p),
          # the only nested-loop allowed is _rank_topk's k-row rank self-join
          # (inequality condition over the cached top-k — k² with k<=10, by
          # design); a Cross BNLJ or CartesianProduct would mean the corpus
          # itself went through an unkeyed join
          ("no cartesian / no cross nested-loop over the corpus",
           "CartesianProduct" not in p
           and "BroadcastNestedLoopJoin Cross" not in p)])
    )

    # 16. robots.txt parse: one Catalyst fold per body — single projection
    from crawlspark.robots import parse_robots_txt

    bodies = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /a\nCrawl-delay: 2\n")], ["host", "body"]
    )
    q = parse_robots_txt(bodies)
    p = fmt(q)
    sections.append(
        ("robots.txt parse: one codegen'd fold per body", p,
         [("no Python/Arrow operator", "MapInPandas" not in p and "ArrowEval" not in p
           and "BatchEvalPython" not in p),
          ("no exchange (pure projection)", "Exchange" not in p)])
    )

    # 17. fused outlink discovery: the discover-links round reads the payload
    #     ONCE — href extraction is a JVM regex in the projection feeding the
    #     extraction UDF, and the 'links' rows ride the same single
    #     MapInPandas output (round-4 verdict #2 done-criterion)
    import tempfile

    from crawlspark.canonical import extract_links_expr

    pages_dir = tempfile.mkdtemp(prefix="plan_audit_pages_")
    spark.createDataFrame(
        [(r["url"], r["html"], "p") for r in rows], ["url", "html", "provider"]
    ).write.mode("overwrite").parquet(pages_dir)
    pages_src = spark.read.parquet(pages_dir)
    keys = pages_src.select("url").limit(3)
    feed = (
        keys.join(pages_src.select(F.col("url").alias("p_url"), "html", "provider"),
                  keys["url"] == F.col("p_url")).drop("p_url")
        .withColumn("outlinks", extract_links_expr(F.col("html"), F.col("url")))
    )
    q = extract_pages(feed, synth.golden_fields(), synth.LANDING_PAGE_FIELD,
                      with_outlinks=True)
    p = fmt(q)
    scan_blocks = [
        b for b in p.split("\n\n")
        if "Scan parquet" in b and "plan_audit_pages_" in b
    ]
    html_scans = [b for b in scan_blocks if "html" in b]
    sections.append(
        ("Fused discovery: ONE payload pass (links extracted in the extraction stage)", p,
         [("exactly one MapInPandas operator", p.count("MapInPandas (") == 1),
          ("href extraction is JVM-side (regexp_extract_all below the UDF)",
           "regexp_extract_all" in p),
          # the key side is column-pruned (url only), so exactly ONE scan in
          # the whole plan carries the html payload — the fused extraction
          # feed; a second payload pass would show a second html ReadSchema
          ("a single payload-carrying (html) scan of the pages source",
           len(html_scans) == 1)])
    )

    # 18. IVF ANN with the TRAINED k-means quantizer: training is driver-side
    #     on a pruned sample scan; the per-row plan is IDENTICAL to the
    #     'first' quantizer — projection-only assignment, broadcast probe
    q = ann_ivf_topk(emb, query_vec_id=0, k=10, quantizer="kmeans")
    p = fmt(q)
    sections.append(
        ("IVF ANN (kmeans quantizer): same projection-only plan as 'first'", p,
         [("no Python/Arrow operator", "MapInPandas" not in p and "ArrowEval" not in p
           and "BatchEvalPython" not in p),
          ("candidate join is a broadcast HASH join on list_id",
           "BroadcastHashJoin" in p),
          ("no cartesian / no cross nested-loop over the corpus",
           "CartesianProduct" not in p
           and "BroadcastNestedLoopJoin Cross" not in p)])
    )

    # 19. benchmark decontamination: benchmark gram set broadcast, corpus side
    #     map-only up to the id-only distinct (no corpus-sized shuffle)
    from crawlspark.textops import decontaminate, domain_quota, split_assign

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = decontaminate(docs, docs.filter(F.col("doc_id") % 97 == 0))
    p = fmt(q)
    sections.append(
        ("Decontamination: broadcast-semi gram probe, id-only shuffle", p,
         [("benchmark gram side is BROADCAST into a semi join",
           "BroadcastHashJoin" in p and "LeftSemi" in p),
          ("grams stay JVM-side (no Python operator)",
           "MapInPandas" not in p and "BatchEvalPython" not in p),
          ("no cartesian product", "CartesianProduct" not in p)])
    )

    # 20. domain quota: two-phase salted top-k — no single-partition exchange
    q = domain_quota(docs, k=20)
    p = fmt(q)
    sections.append(
        ("Domain quota: salted two-phase top-k (skew-safe)", p,
         [("two windowed row_number phases", p.count("Window") >= 2),
          ("never collapses to one partition",
           "Exchange SinglePartition" not in p),
          ("no Python operator", "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 21. split assignment: pure projection — zero exchanges
    q = split_assign(docs)
    p = fmt(q)
    sections.append(
        ("Train/val/test split: shuffle-free pure projection", p,
         [("no Exchange anywhere", "Exchange" not in p),
          ("whole-stage codegen", "codegen id" in p)])
    )

    # 22. repetition gates: sorted-array folds — ZERO exchanges at any
    #     corpus size (the textbook explode+regroup shape would shuffle the
    #     whole corpus on (doc_id, line))
    from crawlspark.textops import pack_sequences, pii_redact, repetition_rules

    q = repetition_rules(docs)
    p = fmt(q)
    sections.append(
        ("Repetition gates: shuffle-free per-doc sorted-array folds", p,
         [("no Exchange anywhere", "Exchange" not in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 23. PII redaction: pure regexp projection
    q = pii_redact(docs)
    p = fmt(q)
    sections.append(
        ("PII redaction: shuffle-free regexp projection", p,
         [("no Exchange anywhere", "Exchange" not in p),
          ("whole-stage codegen", "codegen id" in p)])
    )

    # 24. sequence packing AT SCALE (small_threshold=0 forces the range
    #     path): per-partition running sums + triangular metadata offsets —
    #     no global single-partition window over the corpus
    q = pack_sequences(docs, ctx=2048, small_threshold=0)
    p = fmt(q)
    sections.append(
        ("Sequence packing (range path): partitioned prefix sum", p,
         [("window is partition-local (never SinglePartition over the corpus)",
           "Exchange SinglePartition" not in p),
          ("partition offsets are broadcast back", "BroadcastExchange" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 25. substring dedup: the only corpus-wide exchanges carry (md5, ids) —
    #     TEXT never shuffles (reassembly joins dup window ids back by
    #     doc_id); keeper choice is a hash aggregate, not a window
    from crawlspark.textops import substring_dedup

    q = substring_dedup(docs, window=16, stride=8)
    p = fmt(q)
    sections.append(
        ("Substring (duplicated-span) dedup: id-only exchange", p,
         [("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p),
          ("no cartesian product", "CartesianProduct" not in p),
          ("keeper via hash aggregate (no global window)",
           "HashAggregate" in p and "Exchange SinglePartition" not in p)])
    )

    # 26. host rank: one PageRank iteration — dangling mass rides a 1-row
    #     broadcast, contributions are a map-side-combinable long sum
    from crawlspark.hostrank import host_rank

    edges = docs.select(
        (F.col("doc_id") % 50).cast("string").alias("src"),
        ((F.col("doc_id") * 7 + 1) % 50).cast("string").alias("dst"),
    )
    q = host_rank(edges, iterations=1, checkpoint=False)
    p = fmt(q)
    sections.append(
        ("Host rank (1 iteration): integer PageRank step", p,
         [("dangling mass is a broadcast, not a collect", "BroadcastExchange" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p),
          ("inflow is a partial-aggregated long sum", "HashAggregate" in p)])
    )

    # 27. sitemap parse: pure regexp projection + explode — zero exchanges
    from crawlspark.sitemap import parse_sitemap

    q = parse_sitemap(
        docs.select(F.col("doc_id").cast("string").alias("host"),
                    F.col("text").alias("body"))
    )
    p = fmt(q)
    sections.append(
        ("Sitemap ingestion: shuffle-free parse", p,
         [("no Exchange anywhere", "Exchange" not in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 28. WARC ingestion: the mapInPandas MUST sit on an exchange, never
    #     directly on the scan (Spark 4.1 PythonRunner selector-spin)
    from crawlspark.warc import parse_warc

    q = parse_warc(
        docs.select(F.col("doc_id").cast("string").alias("path"),
                    F.encode("text", "UTF-8").alias("content"))
    )
    p = fmt(q)
    sections.append(
        ("WARC ingestion: exchange below the Python walker", p,
         [("Arrow-batched mapInPandas (not row-at-a-time)",
           "MapInPandas" in p and "BatchEvalPython" not in p),
          ("exchange between scan and UDF (selector-spin guard)",
           "Exchange" in p)])
    )

    # 29. bigram LM likelihood: counts are map-side-combinable hash aggs,
    #     the probe is keyed joins (never broadcast of data-scale counts),
    #     and everything stays JVM-side
    from crawlspark.textops import lm_likelihood

    q = lm_likelihood(docs)
    p = fmt(q)
    sections.append(
        ("Bigram LM likelihood: combinable count aggs + keyed probe joins", p,
         [("map-side partial aggregation on the count tables",
           "partial_count" in p or "HashAggregate" in p),
          ("vocabulary scalar rides a broadcast", "BroadcastNestedLoopJoin" in p
           or "BroadcastExchange" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p),
          ("no cartesian product", "CartesianProduct" not in p)])
    )

    # 30. crawl-trap signals: one combinable groupBy(host) — the per-URL
    #     feature extraction is pure projection
    from crawlspark.canonical import url_trap_signals

    q = url_trap_signals(
        docs.select(
            F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
            (F.col("doc_id") % 7).cast("string").alias("host"),
        )
    )
    p = fmt(q)
    sections.append(
        ("Crawl-trap signals: single combinable host aggregation", p,
         [("exactly one exchange (the host groupBy)", p.count("Exchange") <= 2),
          ("map-side partial aggregation", "HashAggregate" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 31. CCNet buckets: the class cut runs on the quantized HISTOGRAM — the
    #     only Window in the plan consumes an aggregated frame, never the
    #     data-scale doc rows
    from crawlspark.textops import lm_buckets

    q = lm_buckets(docs)
    p = fmt(q)
    sections.append(
        ("CCNet thirds: histogram-cut window (no data-scale sort)", p,
         [("window present for the histogram cumulation", "Window" in p),
          ("histogram aggregate feeds the window (HashAggregate below)",
           "HashAggregate" in p),
          ("no single-partition exchange",
           "Exchange SinglePartition" not in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 32. anchor-text index: data-scale rows pass only through combinable
    #     aggregations; the top-anchor window sits on the (url, anchor)
    #     aggregate
    from crawlspark.canonical import anchor_text_index

    q = anchor_text_index(
        docs.select(
            F.concat(F.lit('<a href="https://t'),
                     (F.col("doc_id") % 5).cast("string"),
                     F.lit('.org/x">a</a>')).alias("payload"),
            F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".org/p")).alias("url"),
        )
    )
    p = fmt(q)
    sections.append(
        ("Anchor-text index: combinable aggs, window above the aggregate", p,
         [("map-side partial aggregation", "HashAggregate" in p),
          ("no single-partition exchange",
           "Exchange SinglePartition" not in p),
          ("no cartesian product", "CartesianProduct" not in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 33. freshness recrawl: the lag window partitions by url (bounded by
    #     round count per partition), aggregation is combinable, no Python
    from crawlspark.freshness import change_rates, recrawl_priorities

    hist = docs.select(
        F.concat(F.lit("u"), (F.col("doc_id") % 120).cast("string")).alias("url"),
        (F.col("doc_id") % 4).cast("int").alias("round"),
        F.concat(F.lit("fp"), (F.col("doc_id") % 3).cast("string")).alias("fingerprint"),
    )
    r = change_rates(hist)
    q = r.join(recrawl_priorities(r), "url")
    p = fmt(q)
    sections.append(
        ("Freshness recrawl: keyed lag window + combinable agg", p,
         [("window partitioned by url (never global)",
           "Window" in p and "Exchange SinglePartition" not in p),
          ("map-side partial aggregation", "HashAggregate" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 34. WET text extraction: one shuffle-free regexp projection
    from crawlspark.textops import html_to_text, term_postings

    q = html_to_text(docs.select("doc_id", F.col("text").alias("payload")))
    p = fmt(q)
    sections.append(
        ("WET text extraction: shuffle-free regexp projection", p,
         [("no Exchange anywhere", "Exchange" not in p),
          ("whole-stage codegen", "codegen id" in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 35. term postings: df aggregates the AGGREGATED tf table; n_docs is a
    #     1-row broadcast; no Python, no cartesian
    q = term_postings(docs)
    p = fmt(q)
    sections.append(
        ("Term postings: combinable tf/df aggs + scalar broadcast", p,
         [("map-side partial aggregation", "HashAggregate" in p),
          ("n_docs scalar joins via broadcast",
           "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p),
          ("no cartesian product", "CartesianProduct" not in p),
          ("no Python operator",
           "MapInPandas" not in p and "BatchEvalPython" not in p)])
    )

    # 36. WARC→WET→gates composed pipeline: exactly ONE Python operator
    #     (the WARC byte walk), an exchange below it (selector-spin guard),
    #     everything downstream pure Catalyst
    q = em.q_pipeline_warc_wet(spark, SF)
    p = fmt(q)
    sections.append(
        ("WARC→WET→gates pipeline: one Python op, Catalyst downstream", p,
         [("exactly one Arrow mapInPandas (the byte walk)",
           # count tree nodes "MapInPandas (n)", not the detail section's
           # "(n) MapInPandas" echo of the same node
           p.count("MapInPandas (") == 1 and "BatchEvalPython" not in p),
          ("exchange below the UDF (selector-spin guard)", "Exchange" in p),
          ("no cartesian product", "CartesianProduct" not in p)])
    )

    out = ["# PLANS.md — physical-plan audit (generated by tools/plan_audit.py)", ""]
    ok_all = True
    for title, plan, checks in sections:
        out.append(f"## {title}\n")
        for desc, ok in checks:
            ok_all &= ok
            out.append(f"- [{'x' if ok else ' '}] {desc}")
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")
    (REPO / "PLANS.md").write_text("\n".join(out) + "\n")
    print("PLANS.md written; all checks pass:", ok_all)
    spark.stop()


if __name__ == "__main__":
    main()
