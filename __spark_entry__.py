"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mini-crawl end-to-end (frontier →
canonicalize → robots → politeness → fetch join → extraction → seen/keys →
metrics) over deterministic synthetic pages sized from sf0.001 documents.

``queries()`` exposes one named query per implemented operator family from
SURVEY.md §2 (S1-S28) plus the training-data ops (dedup / similarity /
text-analysis / multimodal); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible one. Aggregates use exact decimal arithmetic so
Spark and DuckDB agree bit-for-bit; float formatting uses printf-style
rendering available identically on both sides.
"""

from __future__ import annotations

import sys
import tempfile
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


_FIXTURES = str(Path(__file__).resolve().parent / "tests" / "fixtures" / "oracle_sf001")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Mini end-to-end crawl over synthetic pages (size from sf0.001 docs);
    returns the deterministic crawl log (round, seq, url, host, fetched)."""
    from crawlspark import schemas, synth
    from crawlspark.scheduler import Crawler
    from crawlspark.settings import Settings
    from crawlspark.warehouse import Warehouse

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    n = min(100, docs.count())
    n_hosts = 7
    pages = spark.createDataFrame([synth.page_row(i, n_hosts) for i in range(n)], schemas.PAGES)
    frontier = spark.createDataFrame(synth.frontier_rows(n, n_hosts), schemas.FRONTIER)
    robots = spark.createDataFrame(synth.robots_rows(n_hosts), schemas.ROBOTS)
    cache = synth.cache_rows(n, n_hosts)
    cache_df = spark.createDataFrame(cache, schemas.PAGES) if cache else None

    wh = Warehouse(tempfile.mkdtemp(prefix="crawlspark_entry_"))
    crawler = Crawler(
        spark, Settings.new(), wh, synth.golden_fields(), pages, robots, frontier, cache_df
    )
    crawler.run()
    return wh.read_appends(spark, "crawl_log").orderBy("round", "seq")


# ---------------------------------------------------------------------------
# operator queries (S-numbers = SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def q_s01_filter_pushdown(spark, sf):
    # S1: source scan with pushed-down predicate
    return (
        _t(spark, sf, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select("event_id", "user_id", "value")
    )


def q_s02_union_distinct(spark, sf):
    # S2-adjacent frontier union semantics: distinct union
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


def q_s03_nested_projection(spark, sf):
    # S3: nested-field extraction from JSON payloads
    return _t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    )


def q_s04_limit_offset(spark, sf):
    # S4: the debug skip/take window (main.rs:154-169)
    return (
        _t(spark, sf, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey")
        .offset(10)
        .limit(100)
    )


def q_s05_sanitize(spark, sf):
    # S5: filename sanitization (main.rs:171-179)
    return _t(spark, sf, "customer").select(
        "c_custkey", F.regexp_replace("c_name", "[^a-zA-Z-]", "_").alias("sanitized")
    )


def q_s06_fetch_join(spark, sf):
    # S6: fetch = equi-join of the frontier batch against the pages index
    # (file_downloader.rs:13-28 reimagined as a distributed hit test;
    # engine analog crawlspark/scheduler.py:336-401). SHUFFLE_HASH hint as in
    # the engine: size estimates would pick broadcast for the
    # compressed-parquet index, which is wrong at 10^10 pages.
    d = _t(spark, sf, "documents")
    want = d.select((F.col("doc_id") * 2).alias("want_id"))  # half will miss
    idx = d.select(
        F.col("doc_id").alias("p_id"), F.col("source").alias("p_src")
    ).hint("SHUFFLE_HASH")
    return want.join(idx, F.col("want_id") == F.col("p_id"), "left").select(
        "want_id", F.col("p_src").isNotNull().alias("has_page")
    )


def q_s07_coalesce_fallback(spark, sf):
    # S7: fetch-recovery coalesce across sources (main.rs:182-203)
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation").filter(F.col("n_nationkey") < 10)
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left")
        .select("s_suppkey", F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"))
    )


def q_s11_try_cast(spark, sf):
    # S11: NULL-on-failure numeric coercion (abcd_parser.rs:110-114)
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_cast(concat(cast(l_linenumber as string), '.5') as double)").alias("good_cast"),
        F.expr("try_cast(l_returnflag as double)").alias("bad_cast"),
    )


def q_s12_landing_coalesce(spark, sf):
    # S12: landing page = extracted else base?archive=url (abcd_parser.rs:137-150)
    d = _t(spark, sf, "documents")
    extracted = F.when(F.col("lang") == "en", F.lit(None).cast("string")).otherwise(
        F.col("source")
    )
    return d.select(
        "doc_id",
        F.coalesce(
            extracted,
            F.concat(F.lit("https://landing.example?archive="), F.col("doc_id").cast("string")),
        ).alias("landing"),
    )


def q_s14_dedup_firstseen(spark, sf):
    # S14: first-seen-wins dedup (surrogate_key.rs:24-34)
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


def q_s14b_surrogate_keys(spark, sf):
    # S14: dense surrogate keys in first-seen order — via the engine's
    # skew-robust range-partitioned ranking (seen.dense_rank_range), NOT a
    # global single-partition window
    from crawlspark.seen import dense_rank_range

    e = _t(spark, sf, "events")
    # dense_rank_range persists+counts its input itself and picks the
    # single-window fast path for small key counts, the range-partitioned
    # path beyond small_threshold (adaptive — see seen.py)
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return dense_rank_range(
        firsts, ["first_ts", "user_id"], out_col="surrogate_key"
    ).select("user_id", "first_ts", "surrogate_key")


def q_s15_point_wkt(spark, sf):
    # S15: WKT point construction, NULL unless both present (database_sink.rs:659-679)
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 2000)
    wkt = F.when(
        F.col("l_discount").isNotNull() & F.col("l_tax").isNotNull(),
        F.format_string("POINT(%.2f %.2f)", F.col("l_discount"), F.col("l_tax")),
    )
    return li.select("l_orderkey", "l_linenumber", wkt.alias("geom_wkt"))


def q_s21_topk_sort(spark, sf):
    # S21: sort + limit (post-load CLUSTER analog is sort-on-write)
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(50)
    )


def q_s22_exists_semijoin(spark, sf):
    # S22: the listing view's correlated EXISTS as a semi-join flag
    c = _t(spark, sf, "customer")
    big = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
        .distinct()
        .withColumn("_flag", F.lit(True))
    )
    return c.join(big, c["c_custkey"] == big["o_custkey"], "left").select(
        "c_custkey", F.coalesce("_flag", F.lit(False)).alias("has_big_order")
    )


def q_s22b_join3_revenue(spark, sf):
    # multi-join + exact-decimal aggregation (TPC-H Q3 shape)
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_s23_agg_q1(spark, sf):
    # S23: aggregation battery (TPC-H Q1 shape, exact decimal sums)
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_s24_quarantine(spark, sf):
    # S24: per-item error tolerance → status classification + counters
    e = _t(spark, sf, "events")
    status = (
        F.when(F.col("value").isNull(), "null")
        .when(F.col("value") > 90, "outlier")
        .otherwise("ok")
    )
    return e.groupBy("event_type", status.alias("status")).agg(F.count("*").alias("n"))


def q_s25_anti_join(spark, sf):
    # set-op: customers that never ordered (left anti)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").select("o_custkey").distinct()
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey")


def q_s26_politeness_topk(spark, sf):
    # S26: per-host budget-k (politeness) as window top-k per key
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "rk")
    )


def q_s28_counters(spark, sf):
    # S28: observability counters (post_to_slack.py:14-27 analog)
    return _t(spark, sf, "events").groupBy("event_type").agg(F.count("*").alias("n"))


def q_crawl_canonicalize(spark, sf):
    # the RFC-3986 canonicalizer over synthesized messy urls
    from crawlspark.canonical import canonicalize_expr

    d = _t(spark, sf, "documents")
    raw = F.concat(
        F.lit("HTTPS://HOST"),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".EXAMPLE.ORG:443/x/../p/"),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )
    return d.select("doc_id", canonicalize_expr(raw).alias("canonical_url"))


def q_crawl_robots_filter(spark, sf):
    # robots disallow-prefix filtering on canonical paths
    d = _t(spark, sf, "documents")
    path = F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
    return d.filter(~path.startswith("/p/9")).select("doc_id", path.alias("path"))


def q_crawl_link_extract(spark, sf):
    # outlink discovery (canonical.extract_links_expr): href scrape + the
    # documented RFC-3986 resolution subset over synthesized html — the
    # canonical targets are closed forms of doc_id
    from crawlspark.canonical import extract_links_expr

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 1000)
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><a href="https://HOST'), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit('.EXAMPLE.ORG:443/x/../p/'), (F.col("doc_id") + 1).cast("string"),
        F.lit('#frag">n</a><a href="/rel/'), did,
        F.lit('">r</a><a href="mailto:a@b">skip</a></html>'),
    )
    base = F.concat(
        F.lit("https://host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example.org/index.html"),
    )
    return d.select(
        "doc_id",
        F.explode(extract_links_expr(F.encode(html, "UTF-8"), base)).alias("link"),
    )


def q_crawl_robots_parse(spark, sf):
    # raw robots.txt bodies → enforced rules (crawlspark.robots): bodies are
    # deterministic functions of doc_id, so the PARSED output has a closed
    # form the SQL oracle states directly (comments, other-UA sections and
    # an empty Disallow are present to be correctly ignored)
    from crawlspark.robots import parse_robots_txt, robots_rules_table

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
    did = F.col("doc_id").cast("string")
    body = F.concat(
        F.lit("# synthetic robots\nUser-agent: *\nDisallow: /p/9  # note\n"
              "Disallow: /admin"), did,
        F.lit("\nDisallow:\nCrawl-delay: "), (1 + F.col("doc_id") % 5).cast("string"),
        F.lit("\n\nUser-agent: OtherBot\nDisallow: /hidden\n"),
    )
    rules = robots_rules_table(
        parse_robots_txt(
            d.select(F.concat(F.lit("host"), did).alias("host"), body.alias("body"))
        )
    )
    return rules.select(
        "host",
        F.explode("disallow_prefixes").alias("prefix"),
        "crawl_delay_s",
        "max_per_round",
    )


def q_extraction_units(spark, sf):
    # S8+S9: ZIP explode + XML extraction (rows-only; golden bytes in pytest)
    from crawlspark import synth, schemas
    from crawlspark.extract import extract_pages
    from crawlspark.fields import sha1_hex

    rows = [synth.page_row(i, 5) for i in range(40)]
    df = spark.createDataFrame(
        [(r["url"], r["html"], "prov") for r in rows], ["url", "html", "provider"]
    )
    ex = extract_pages(df, synth.golden_fields(), synth.LANDING_PAGE_FIELD)
    unit_id = sha1_hex("/DataSets/DataSet/Units/Unit/UnitID")
    lon = sha1_hex(
        "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal"
    )
    return ex.filter(F.col("kind") == "unit").select(
        "url", "member_index", "unit_index", F.col(unit_id).alias("unit_id"), F.col(lon).alias("lon")
    )


def q_extraction_version(spark, sf):
    """ABCD version sniff through the full Spark extraction path
    (abcd_parser.rs:62-78 semantics): three handcrafted archives with 2.06,
    2.1 and no namespace; the sniffed version must ride the abcd_version
    meta column. Closed-form oracle (deterministic input built in-query)."""
    import io
    import zipfile

    from crawlspark import synth
    from crawlspark.extract import extract_pages

    def zip_of(xml: bytes) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("dataset.xml", xml)
        return buf.getvalue()

    body = b"<DataSet><Units><Unit></Unit></Units></DataSet></DataSets>"
    pages = [
        ("http://v/206", zip_of(
            b'<DataSets xmlns="http://www.tdwg.org/schemas/abcd/2.06">' + body)),
        ("http://v/210", zip_of(
            b"<DataSets xmlns='http://www.tdwg.org/schemas/abcd/2.1'>" + body)),
        ("http://v/none", zip_of(b"<DataSets>" + body)),
    ]
    df = spark.createDataFrame(
        [(u, b, "prov") for u, b in pages], ["url", "html", "provider"]
    )
    ex = extract_pages(df, synth.golden_fields(), synth.LANDING_PAGE_FIELD)
    return ex.filter(F.col("kind") == "dataset").select(
        "url", "abcd_version"
    ).orderBy("url")


# ---------------------------------------------------------------------------
# training-data ops
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    from crawlspark.textops import exact_dedup_groups

    d = _t(spark, sf, "documents")
    # inject deterministic duplicates (testdata has none): every 10th doc twice
    dups = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return exact_dedup_groups(d.unionByName(dups)).orderBy("keep_doc_id")


def q_line_dedup(spark, sf):
    # corpus-level line dedup (C4 §2.2 / RefinedWeb line-wise): a corpus
    # where each doc carries unique body lines plus injected shared
    # boilerplate lines; the op must strip exactly the boilerplate and
    # reassemble the unique lines in order. Body lines are made provably
    # unique by prefixing doc_id, so the expected output is a closed form.
    from crawlspark.textops import line_dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 2000)
    did = F.col("doc_id").cast("string")
    a = F.concat(did, F.lit(":"), F.substring("text", 1, 40))
    b = F.concat(did, F.lit("~"), F.substring("text", 41, 40))
    text = F.concat(
        a, F.lit(". THIS SITE USES COOKIES. "), b,
        F.when(F.col("doc_id") % 2 == 0, F.lit(". SHARED FOOTER NAVIGATION")).otherwise(F.lit("")),
    )
    return line_dedup(d.select("doc_id", text.alias("text"))).orderBy("doc_id")


def q_dedup_minhash(spark, sf):
    from crawlspark.textops import minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    dups = d.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return minhash_lsh_pairs(d.unionByName(dups), jaccard_threshold=0.8).orderBy("a", "b")


def q_dedup_simhash(spark, sf):
    from crawlspark.textops import simhash_near_pairs

    d = _t(spark, sf, "documents")
    dups = d.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return simhash_near_pairs(d.unionByName(dups), max_hamming=3).orderBy("a", "b")


def q_dedup_clusters(spark, sf):
    # connected components (iterative min-label propagation) over a chain
    # graph derived from doc_ids: chains i→i+1→i+2→i+3 for i%10==0 — the
    # closed form (cluster = node - node%10) gives an exact SQL oracle for
    # an iterative algorithm; transitivity over REAL minhash pairs is pinned
    # in tests/test_textops.py
    from crawlspark.textops import dedup_clusters

    d = _t(spark, sf, "documents").select("doc_id")
    edges = d.filter(F.col("doc_id") % 10 < 3).select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b")
    )
    return dedup_clusters(edges).orderBy("doc_id")


def q_ngram_jaccard(spark, sf):
    # word-set jaccard of consecutive doc pairs (SQL-expressible)
    d = _t(spark, sf, "documents").select("doc_id", "text")
    a = d.alias("a")
    b = d.withColumn("doc_id", F.col("doc_id") - 1).alias("b")
    pairs = a.join(b, "doc_id").select(
        F.col("doc_id").alias("a_id"),
        F.array_distinct(F.split(F.col("a.text"), " ")).alias("wa"),
        F.array_distinct(F.split(F.col("b.text"), " ")).alias("wb"),
    )
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size(F.array_union("wa", "wb"))
    return pairs.select(
        "a_id",
        inter.alias("n_inter"),
        union.alias("n_union"),
        F.round(inter / union, 6).alias("jaccard"),
    )


def q_ann_bruteforce(spark, sf):
    from crawlspark.textops import ann_bruteforce_topk

    return ann_bruteforce_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10)


def q_ann_lsh(spark, sf):
    from crawlspark.textops import ann_lsh_topk

    return ann_lsh_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10, planes=6)


def q_ann_ivf(spark, sf):
    # IVF ANN: deterministic coarse quantizer (centroids = vec_id < nlist),
    # posting-list assignment as a pure projection, nprobe multi-probe +
    # exact cosine re-rank (textops.ann_ivf_topk)
    from crawlspark.textops import ann_ivf_topk

    return ann_ivf_topk(_t(spark, sf, "embeddings"), query_vec_id=0, k=10)


def q_ann_ivf_kmeans(spark, sf):
    # IVF ANN with the TRAINED coarse quantizer: deterministic driver-side
    # Lloyd k-means on the vec_id < 256 sample (textops.kmeans_centroids),
    # then the same pure-projection assignment / nprobe probe / exact cosine
    # re-rank as ann_ivf. Oracle: bit-identical pure-Python mirror fixture
    # (tools/make_fixtures.py ann_ivf_kmeans_fixture).
    from crawlspark.textops import ann_ivf_topk

    return ann_ivf_topk(
        _t(spark, sf, "embeddings"), query_vec_id=0, k=10, quantizer="kmeans"
    )


def q_embed_neardup(spark, sf):
    from crawlspark.textops import embedding_near_dup_pairs

    e = _t(spark, sf, "embeddings")
    dups = e.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1000000
    )
    return embedding_near_dup_pairs(e.unionByName(dups), threshold=0.999).orderBy("a", "b")


def q_ann_knn_join(spark, sf):
    # batch k-NN join (exact): top-5 corpus neighbors for every query vector
    from crawlspark.textops import ann_knn_join_bruteforce

    e = _t(spark, sf, "embeddings")
    return ann_knn_join_bruteforce(e, e.filter(F.col("vec_id") < 8), k=5)


def q_gopher_quality(spark, sf):
    from crawlspark.textops import gopher_quality_rules

    return gopher_quality_rules(_t(spark, sf, "documents"))


def q_lang_id(spark, sf):
    from crawlspark.textops import lang_id_heuristic

    return lang_id_heuristic(_t(spark, sf, "documents"))


def q_quality_score(spark, sf):
    from crawlspark.textops import quality_score

    return quality_score(_t(spark, sf, "documents"))


def q_token_count(spark, sf):
    from crawlspark.textops import token_count

    return token_count(_t(spark, sf, "documents"))


def q_fingerprint(spark, sf):
    from crawlspark.textops import fingerprint

    return fingerprint(_t(spark, sf, "documents")).select("doc_id", "md5_fp")


def q_fingerprint_winnow(spark, sf):
    # winnowing fingerprints (sub-document near-dup evidence; Schleimer 2003)
    from crawlspark.textops import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf, "documents"))


def q_decontaminate(spark, sf):
    # benchmark decontamination (GPT-3 appx C): eval set = every 97th doc;
    # any training doc sharing a 5-gram with it is flagged. Broadcast-semi
    # shape — no corpus shuffle beyond the id-only distinct.
    from crawlspark.textops import decontaminate

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(d, bench, shingle_n=5).orderBy("doc_id")


def q_domain_quota(spark, sf):
    # per-domain contribution cap (C4 §2.3 style): top-20 docs per source by
    # length, two-phase salted top-k (identical output to the single window)
    from crawlspark.textops import domain_quota

    return domain_quota(_t(spark, sf, "documents"), k=20).orderBy("doc_id")


def q_split_assign(spark, sf):
    # deterministic md5-bucket train/val/test split — reproducible under
    # re-runs and repartitioning, portable to the SQL oracle
    from crawlspark.textops import split_assign

    return split_assign(_t(spark, sf, "documents")).orderBy("doc_id")


def q_repetition_rules(spark, sf):
    # Gopher §A1.2 repetition gates — shuffle-free sorted-array folds (no
    # (doc_id, line) exchange); oracle recomputes via unnest + GROUP BY.
    # The repartition is INPUT-SPLIT SIMULATION, not part of the operator:
    # sf0.1 documents.parquet is one ~1.5 MB split, which would run this
    # CPU-bound projection on a single core; a real corpus arrives in many
    # splits (the op itself stays exchange-free — see PLANS.md §22).
    from crawlspark.textops import repetition_rules

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return repetition_rules(
        _t(spark, sf, "documents").repartition(n)
    ).orderBy("doc_id")


def q_pii_redact(spark, sf):
    # PII scrub audit: deterministic synthetic PII appended per doc (the
    # corpus itself is clean) so email/IP/phone branches all fire; identical
    # footer is built in the oracle SQL
    from crawlspark.textops import pii_redact

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" tel 555-01"),
                            (F.col("doc_id") % 10).cast("string"),
                            F.lit("-4242")))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(d).orderBy("doc_id")


def q_pack_sequences(spark, sf):
    # GPT-2 concat-and-chunk packing: global exclusive token prefix sum +
    # ctx-2048 sequence index (adaptive: window small, range-partitioned big)
    from crawlspark.textops import pack_sequences

    return pack_sequences(_t(spark, sf, "documents"), ctx=2048).orderBy("doc_id")


def q_substring_dedup(spark, sf):
    # Lee et al. 2021 ExactSubstr (window relaxation, keep-first): corpus
    # with doc-unique prefixes of varying length (12-14 tokens, so the shared
    # span lands at three different window alignments) plus a 14-token span
    # shared by every doc_id%5==0 document — long enough (>= window+stride-1)
    # that EVERY alignment contains duplicated windows. The oracle recomputes
    # the whole construction the textbook way (unnest + window functions).
    from crawlspark.textops import substring_dedup

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 600)
    did = F.col("doc_id").cast("string")
    uniq = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(11) + F.col("doc_id") % 3),
            lambda j: F.concat(F.lit("u"), did, F.lit("x"), j.cast("string")),
        ),
    )
    shared = F.lit(" ".join(f"s{k}" for k in range(14)))
    text = F.when(
        F.col("doc_id") % 5 == 0, F.concat(uniq, F.lit(" "), shared)
    ).otherwise(uniq)
    return substring_dedup(
        d.select("doc_id", text.alias("text")), window=8, stride=4
    ).orderBy("doc_id")


def q_lm_likelihood(spark, sf):
    # corpus-trained add-one bigram LM likelihood (CCNet-style quality
    # signal, Wenzek et al. 2020) — integer fixed-point, bit-exact at any
    # parallelism, so the DuckDB oracle mirrors the arithmetic directly
    from crawlspark.textops import lm_likelihood

    return lm_likelihood(_t(spark, sf, "documents")).orderBy("doc_id")


def q_lm_buckets(spark, sf):
    # CCNet §4.3 head/middle/tail thirds per language, cut on the quantized
    # score histogram (no per-lang data-scale window) — exact integers
    from crawlspark.textops import lm_buckets

    return lm_buckets(_t(spark, sf, "documents")).orderBy("doc_id")


def q_crawl_trap_detect(spark, sf):
    # per-host crawl-trap score over synthesized URL shapes: hosts 0-2 get
    # trap-pattern paths (repeated segments / depth-10 / 5 query params),
    # hosts 3-6 stay clean, so the host-level trap flag actually varies
    from crawlspark.canonical import url_trap_signals

    d = _t(spark, sf, "documents")
    host = F.concat(
        F.lit("host"), F.pmod("doc_id", F.lit(7)).cast("string"),
        F.lit(".example.org"),
    )
    tail = F.col("doc_id").cast("string")
    trap_path = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, F.concat(F.lit("/a/b/a/b/a/b/"), tail))
        .when(
            F.pmod("doc_id", F.lit(3)) == 1,
            F.concat(F.lit("/d1/d2/d3/d4/d5/d6/d7/d8/d9/"), tail),
        )
        .otherwise(F.concat(F.lit("/p/"), tail, F.lit("?a=1&b=2&c=3&d=4&e=5")))
    )
    path = F.when(F.pmod("doc_id", F.lit(7)) < 3, trap_path).otherwise(
        F.concat(F.lit("/p/"), tail)
    )
    urls = d.select(
        F.concat(F.lit("https://"), host, path).alias("url"), host.alias("host")
    )
    return url_trap_signals(urls).orderBy("host")


def q_anchor_text_index(spark, sf):
    # anchor-text inlink index over synthesized HTML: absolute + root-
    # relative links resolve, mailto: drops; oracle states the resolved
    # (src_host, target, anchor) edges in closed form and re-aggregates
    from crawlspark.canonical import anchor_text_index

    d = _t(spark, sf, "documents")
    mod = lambda k: F.pmod("doc_id", F.lit(k)).cast("string")  # noqa: E731
    html = F.concat(
        F.lit('<p>x</p><a href="https://t'), mod(5),
        F.lit('.example.org/x">anchor '), mod(3),
        F.lit('</a><a href="/rel/'), mod(4),
        F.lit('">self '), mod(2),
        F.lit('</a><a href="mailto:z@q">drop</a>'),
    )
    base = F.concat(
        F.lit("https://host"), mod(7), F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    pages = d.select(html.alias("payload"), base.alias("url"))
    return anchor_text_index(pages).orderBy("url")


def q_html_to_text(spark, sf):
    # WET-step visible-text extraction over synthesized HTML wrapping the
    # documents' text; oracle runs the identical Java∩RE2 regexp chain
    from crawlspark.textops import html_to_text

    d = _t(spark, sf, "documents")
    html = F.concat(
        F.lit("<html><head><title>t</title><style>x{color:red}</style>"
              "<script>var a=1;</script></head><body><p>"),
        F.col("text"),
        F.lit("</p><div>A &amp;amp; B &lt;tag&gt;</div><!-- note --><ul><li>one"
              "</li><li>two</li></ul><br/>end</body></html>"),
    )
    return html_to_text(
        d.select("doc_id", html.alias("payload"))
    ).orderBy("doc_id")


def q_term_postings(spark, sf):
    # exact TF/DF inverted-index fact table (integer core of TF-IDF)
    from crawlspark.textops import term_postings

    return term_postings(_t(spark, sf, "documents")).orderBy("term", "doc_id")


def q_crawl_robots_sitemaps(spark, sf):
    # Sitemap: directive extraction (RFC 9309 §2.3) — UA-independent, colon
    # in the URL preserved, comments stripped, multiple directives kept
    from crawlspark.robots import robots_sitemaps

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    h = F.pmod("doc_id", F.lit(9)).cast("string")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /x\nSitemap: https://s"), h,
        F.lit(".example.org/m"), F.col("doc_id").cast("string"),
        F.lit(".xml # main\n"),
        F.when(
            F.pmod("doc_id", F.lit(3)) == 0,
            F.concat(F.lit("sitemap: https://s"), h,
                     F.lit(".example.org/extra.xml\n")),
        ).otherwise(F.lit("")),
        F.lit("Sitemap:\nNoise line\n"),
    )
    bodies = d.select(
        F.concat(F.lit("host"), h, F.lit(".example.org")).alias("host"),
        body.alias("body"),
    )
    return robots_sitemaps(bodies).orderBy("host", "sitemap_url")


def q_recrawl_priorities(spark, sf):
    # Cho-GM change-rate recrawl tiers over a synthetic fetch history:
    # 120 urls × rounds with planted fingerprint churn and duplicate
    # (url, round) retry rows (min-fp collapse)
    from crawlspark.freshness import change_rates, recrawl_priorities

    d = _t(spark, sf, "documents")
    hist = d.select(
        F.concat(
            F.lit("https://h.org/p/"), F.pmod("doc_id", F.lit(120)).cast("string")
        ).alias("url"),
        F.pmod(F.expr("doc_id div 120"), F.lit(4)).cast("int").alias("round"),
        F.concat(
            F.lit("fp"), F.pmod(F.expr("(doc_id * 13) div 7"), F.lit(3)).cast("string")
        ).alias("fingerprint"),
    )
    rates = change_rates(hist)
    return rates.join(recrawl_priorities(rates), "url").orderBy("url")


def q_crawl_host_graph(spark, sf):
    # fetched pages → the host link graph host_rank consumes (self-host
    # edges drop, duplicates collapse); oracle states the resolved edges
    from crawlspark.hostrank import host_graph_from_pages

    d = _t(spark, sf, "documents")
    h = F.pmod("doc_id", F.lit(7)).cast("string")
    html = F.concat(
        F.lit('<a href="https://t'), F.pmod("doc_id", F.lit(5)).cast("string"),
        F.lit('.example.org/x">a</a><a href="/self">s</a>'
              '<a href="https://host'), h, F.lit('.example.org/p">own</a>'),
    )
    base = F.concat(
        F.lit("https://host"), h, F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    pages = d.select(html.alias("payload"), base.alias("url"))
    return host_graph_from_pages(pages).orderBy("src", "dst")


def q_host_rank(spark, sf):
    # fixed-point integer PageRank over a synthetic host graph (50 hosts,
    # hosts h0/h10/h20/h30/h40 dangling); bit-exact at any parallelism, so
    # the oracle unrolls the same integer recurrence in SQL
    from crawlspark.hostrank import host_rank

    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") < 500) & ((F.col("doc_id") % 50 % 10) != 0)
    )
    h = lambda e: F.concat(F.lit("h"), e.cast("string"))  # noqa: E731
    e1 = d.select(h(F.col("doc_id") % 50).alias("src"),
                  h((F.col("doc_id") * 7 + 1) % 50).alias("dst"))
    e2 = d.select(h(F.col("doc_id") % 50).alias("src"),
                  h((F.col("doc_id") * 3 + 2) % 50).alias("dst"))
    return host_rank(e1.unionByName(e2), iterations=6).orderBy("host")


def _sitemap_bodies(spark, sf):
    # deterministic sitemap bodies: a urlset with one full entry (loc with
    # padding whitespace + lastmod + priority), one minimal entry
    # (changefreq only), one loc-less entry (must be dropped), then a
    # sitemapindex child — regex parser handles the concatenation fine
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    did = F.col("doc_id").cast("string")
    day = F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0")
    body = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<urlset '
              'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              ' <url>\n  <loc> https://site'), did,
        F.lit(".example.org/page/"), did,
        F.lit(" </loc>\n  <lastmod>2024-01-"), day,
        F.lit("</lastmod>\n  <priority>0."), (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority>\n </url>\n <url><loc>https://site"), did,
        F.lit(".example.org/extra</loc><changefreq>daily</changefreq></url>\n"
              " <url><lastmod>2030-01-01</lastmod></url>\n</urlset>\n"
              "<sitemapindex><sitemap>\n<loc>https://site"), did,
        F.lit(".example.org/sitemap-2.xml</loc>\n"
              "<lastmod>2024-02-02</lastmod></sitemap></sitemapindex>"),
    )
    return d.select(F.concat(F.lit("site"), did).alias("host"), body.alias("body"))


def q_crawl_sitemap_parse(spark, sf):
    # sitemaps.org 0.9 ingestion (crawlspark.sitemap): bodies are closed
    # forms of doc_id, so the oracle states the parsed rows directly
    from crawlspark.sitemap import parse_sitemap

    return parse_sitemap(_sitemap_bodies(spark, sf)).orderBy("host", "kind", "loc")


def q_crawl_sitemap_frontier(spark, sf):
    # parsed urlset entries → FRONTIER rows: sitemap priority 0.k maps to
    # scheduler priority 10-k, lastmod to warc_ts, absent priority to the
    # 0.5 protocol default (priority 5)
    from crawlspark.sitemap import parse_sitemap, sitemap_frontier

    parsed = parse_sitemap(_sitemap_bodies(spark, sf))
    return sitemap_frontier(parsed, discovered_round=3).orderBy("url")


def _warc_archives(spark, sf):
    # per doc: one WARC/1.0 response record (HTTP-wrapped payload) + one
    # metadata record (no HTTP wrapper, no status). Every 10th payload
    # EMBEDS the bytes 'WARC/1.0' — Content-Length framing must carry the
    # parser straight past it (the reason this is a byte walk, not a split)
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html>doc"), did,
        F.when(F.col("doc_id") % 10 == 0, F.lit(" WARC/1.0")).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), payload
    )
    rec1 = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://w"),
        did, F.lit(".example.org/p\r\nWARC-Date: 2024-01-02T03:04:05Z\r\n"
                   "Content-Type: application/http; msgtype=response\r\n"
                   "Content-Length: "),
        F.length(F.encode(http, "UTF-8")).cast("string"), F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"),
    )
    meta = F.concat(F.lit("meta"), did)
    rec2 = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: https://w"),
        did, F.lit(".example.org/p\r\nWARC-Date: 2024-01-02T03:04:06Z\r\n"
                   "Content-Length: "),
        F.length(F.encode(meta, "UTF-8")).cast("string"), F.lit("\r\n\r\n"), meta, F.lit("\r\n\r\n"),
    )
    return d.select(
        F.concat(F.lit("w"), did).alias("path"),
        F.encode(F.concat(rec1, rec2), "UTF-8").alias("content"),
    )


def q_crawl_warc_parse(spark, sf):
    # WARC/1.0 archive walk (crawlspark.warc): Content-Length framing via
    # Arrow-batched mapInPandas, one task per archive; payload decoded to
    # string for the value-hash compare
    from crawlspark.warc import parse_warc

    recs = parse_warc(_warc_archives(spark, sf))
    return recs.select(
        "src", "record_index", "warc_type", "target_uri", "warc_date",
        "http_status", F.decode("payload", "UTF-8").alias("payload_text"),
        "payload_len", "error",
    ).orderBy("src", "record_index")


def q_crawl_warc_pages(spark, sf):
    # WARC responses → the north_rule's PAGES load edge (url, warc_ts, html)
    from crawlspark.warc import pages_from_warc, parse_warc

    pages = pages_from_warc(parse_warc(_warc_archives(spark, sf)))
    return pages.select(
        "url", "warc_ts", F.decode("html", "UTF-8").alias("html_text"),
        "text", "lang",
    ).orderBy("url")


def q_pipeline_warc_wet(spark, sf):
    # the full ingestion chain composed: WARC byte walk → PAGES load edge →
    # WET visible-text extraction → Gopher gates. One connected plan from
    # archive bytes to per-document keep verdicts (the Common-Crawl
    # WARC→WET→filtered-corpus path in one query).
    from crawlspark.textops import gopher_quality_rules, html_to_text
    from crawlspark.warc import pages_from_warc, parse_warc

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 300)
    did = F.col("doc_id").cast("string")
    payload = F.concat(
        F.lit("<html><head><script>var a=1;</script></head><body><p>"),
        F.col("text"),
        F.lit("</p><div>tail &amp; x</div></body></html>"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), payload
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://w"),
        did, F.lit(".example.org/p\r\nWARC-Date: 2024-01-02T03:04:05Z\r\n"
                   "Content-Type: application/http; msgtype=response\r\n"
                   "Content-Length: "),
        F.length(F.encode(http, "UTF-8")).cast("string"), F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"),
    )
    archives = d.select(
        F.concat(F.lit("w"), did).alias("path"),
        F.encode(rec, "UTF-8").alias("content"),
    )
    pages = pages_from_warc(parse_warc(archives))
    wet = html_to_text(
        pages.select(F.col("url").alias("doc_id"), F.col("html").alias("payload"))
    )
    # gates are a pure projection — carry text/n_chars through instead of
    # re-joining wet (a join would DUPLICATE the WARC-parse subtree: two
    # MapInPandas in the plan, the byte walk run twice)
    return (
        gopher_quality_rules(wet, carry_cols=("text", "n_chars"))
        .select(F.col("doc_id").alias("url"), "text", "n_chars", "n_words", "keep")
        .orderBy("url")
    )


def q_pipeline_training_set(spark, sf):
    # SECOND COMPOSED PIPELINE, fully SQL-oracle-expressible end-to-end:
    # the "raw corpus → training set" chain a 100 TB curation run executes —
    # Gopher quality gates → exact content dedup (first-seen keeper) →
    # benchmark decontamination (broadcast 5-gram overlap vs the eval set)
    # → per-domain quota cap (top-20 by length, salted two-phase) →
    # deterministic md5-bucket train/val/test assignment. Unlike
    # pipeline_curate (whose minhash stage needs a fixture mirror), every
    # stage here has exact ANSI-SQL semantics, so the ORACLE IS THE WHOLE
    # CHAIN — one DuckDB WITH-query validates the composition itself.
    from crawlspark.textops import (
        decontaminate,
        domain_quota,
        gopher_quality_rules,
        split_assign,
    )

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    # gated corpus persisted once: consumed by the keeper aggregation AND the
    # survivor semi-join (same pattern as pipeline_curate, PLANS.md §pipeline)
    gated = d.join(
        gopher_quality_rules(d).filter("keep").select("doc_id"), "doc_id"
    ).persist()
    keepers = (
        gated.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = gated.join(keepers, "doc_id", "left_semi")
    clean = uniq.join(
        decontaminate(uniq.select("doc_id", "text"), bench)
        .filter(~F.col("contaminated"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    quota = domain_quota(clean, k=20)
    return (
        quota.join(split_assign(quota), "doc_id")
        .select("doc_id", "domain", "split")
        .orderBy("doc_id")
    )


def q_pipeline_curate(spark, sf):
    # FLAGSHIP COMPOSED PIPELINE: the actual LLM-curation chain, one plan —
    # gopher quality gates → MinHash-LSH near-dup pairs → connected-components
    # keepers → token counts on the surviving corpus. Each stage has its own
    # battery entry; this row proves they compose without stage-boundary plan
    # regressions (gated corpus persisted once, consumed by the signature
    # pass AND the survivor anti-join — no recomputed scans; PLANS.md §pipeline)
    from crawlspark.textops import (
        dedup_clusters,
        gopher_quality_rules,
        minhash_lsh_pairs,
        token_count,
    )

    d = _t(spark, sf, "documents")
    dups = d.filter(F.col("doc_id") % 25 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = d.unionByName(dups).select("doc_id", "text")
    gated = corpus.join(
        gopher_quality_rules(corpus).filter("keep").select("doc_id"), "doc_id"
    ).persist()
    pairs = minhash_lsh_pairs(gated, jaccard_threshold=0.8)
    losers = dedup_clusters(pairs).filter(~F.col("is_keeper")).select("doc_id")
    survivors = gated.join(losers, "doc_id", "left_anti")
    return token_count(survivors)


def q_multimodal_image(spark, sf):
    from crawlspark.multimodal import decode_image_features, documents_as_binary

    d = documents_as_binary(_t(spark, sf, "documents"))
    return decode_image_features(d).select("doc_id", "width", "height", "n_bytes", "decoder")


def q_multimodal_png(spark, sf):
    # REAL decode branch: deterministic PNG payloads (pure-stdlib encoder,
    # executor-side) roundtripped through the pure-stdlib PNG decoder — the
    # oracle checks decoded width/height/mode against the encode parameters
    from crawlspark.multimodal import decode_image_features, synth_png_payloads

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return decode_image_features(synth_png_payloads(d)).select(
        "doc_id", "width", "height", "mode", "decoder"
    )


def q_multimodal_wav(spark, sf):
    # REAL audio branch: deterministic PCM-WAV payloads (pure-stdlib RIFF
    # encoder, executor-side, integer waveform = closed form of doc_id)
    # parsed by the pure-stdlib WAV decoder — rate/length/duration AND the
    # RMS (exact f64 arithmetic over integer samples) all have ANSI-SQL
    # closed forms
    from crawlspark.multimodal import decode_audio_features, synth_wav_payloads

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return decode_audio_features(synth_wav_payloads(d))


def q_multimodal_frames(spark, sf):
    from crawlspark.multimodal import documents_as_binary, frame_sample

    d = documents_as_binary(_t(spark, sf, "documents").filter(F.col("doc_id") < 50))
    return frame_sample(d)


def q_multimodal_gif(spark, sf):
    # REAL frame-splitter branch: deterministic animated-GIF payloads
    # (pure-stdlib GIF89a encoder, executor-side) walked by the pure-stdlib
    # container parser — the oracle checks per-frame byte spans, dimensions
    # and the sampling stride as closed forms of doc_id
    from crawlspark.multimodal import frame_sample, synth_gif_payloads

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return frame_sample(synth_gif_payloads(d))


def q_multimodal_avi(spark, sf):
    # REAL RIFF/AVI frame-splitter branch (round-4 verdict #5 — a second
    # real container so the stub is reserved for genuinely unknown bytes):
    # deterministic AVI payloads (pure-stdlib encoder, executor-side) walked
    # by the pure-stdlib movi-chunk parser — the oracle checks per-frame
    # chunk spans, avih dimensions and the sampling stride as closed forms
    # of doc_id (crawlspark.multimodal.avi_frames / synth_avi_payloads)
    from crawlspark.multimodal import frame_sample, synth_avi_payloads

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return frame_sample(synth_avi_payloads(d))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s01_filter_pushdown": q_s01_filter_pushdown,
        "s02_union_distinct": q_s02_union_distinct,
        "s03_nested_projection": q_s03_nested_projection,
        "s04_limit_offset": q_s04_limit_offset,
        "s05_sanitize": q_s05_sanitize,
        "s06_fetch_join": q_s06_fetch_join,
        "s07_coalesce_fallback": q_s07_coalesce_fallback,
        "s11_try_cast": q_s11_try_cast,
        "s12_landing_coalesce": q_s12_landing_coalesce,
        "s14_dedup_firstseen": q_s14_dedup_firstseen,
        "s14b_surrogate_keys": q_s14b_surrogate_keys,
        "s15_point_wkt": q_s15_point_wkt,
        "s21_topk_sort": q_s21_topk_sort,
        "s22_exists_semijoin": q_s22_exists_semijoin,
        "s22b_join3_revenue": q_s22b_join3_revenue,
        "s23_agg_q1": q_s23_agg_q1,
        "s24_quarantine": q_s24_quarantine,
        "s25_anti_join": q_s25_anti_join,
        "s26_politeness_topk": q_s26_politeness_topk,
        "s28_counters": q_s28_counters,
        "crawl_canonicalize": q_crawl_canonicalize,
        "crawl_robots_filter": q_crawl_robots_filter,
        "crawl_robots_parse": q_crawl_robots_parse,
        "crawl_link_extract": q_crawl_link_extract,
        "extraction_units": q_extraction_units,
        "extraction_version": q_extraction_version,
        "dedup_exact": q_dedup_exact,
        "line_dedup": q_line_dedup,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_kmeans": q_ann_ivf_kmeans,
        "embed_neardup": q_embed_neardup,
        "ann_knn_join": q_ann_knn_join,
        "pipeline_curate": q_pipeline_curate,
        "pipeline_training_set": q_pipeline_training_set,
        "gopher_quality": q_gopher_quality,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "decontaminate": q_decontaminate,
        "domain_quota": q_domain_quota,
        "split_assign": q_split_assign,
        "repetition_rules": q_repetition_rules,
        "pii_redact": q_pii_redact,
        "pack_sequences": q_pack_sequences,
        "substring_dedup": q_substring_dedup,
        "lm_likelihood": q_lm_likelihood,
        "lm_buckets": q_lm_buckets,
        "crawl_trap_detect": q_crawl_trap_detect,
        "anchor_text_index": q_anchor_text_index,
        "crawl_robots_sitemaps": q_crawl_robots_sitemaps,
        "recrawl_priorities": q_recrawl_priorities,
        "crawl_host_graph": q_crawl_host_graph,
        "html_to_text": q_html_to_text,
        "term_postings": q_term_postings,
        "pipeline_warc_wet": q_pipeline_warc_wet,
        "host_rank": q_host_rank,
        "crawl_sitemap_parse": q_crawl_sitemap_parse,
        "crawl_sitemap_frontier": q_crawl_sitemap_frontier,
        "crawl_warc_parse": q_crawl_warc_parse,
        "crawl_warc_pages": q_crawl_warc_pages,
        "fingerprint_winnow": q_fingerprint_winnow,
        "multimodal_image": q_multimodal_image,
        "multimodal_png": q_multimodal_png,
        "multimodal_wav": q_multimodal_wav,
        "multimodal_frames": q_multimodal_frames,
        "multimodal_gif": q_multimodal_gif,
        "multimodal_avi": q_multimodal_avi,
    }


def _lang_id_sql() -> str:
    from crawlspark.textops import _STOPWORDS

    def cnt(needle: str) -> str:
        n = needle.replace("'", "''")
        return (
            f"cast((length(p) - length(replace(p, ' {n} ', ''))) / {len(needle) + 2} as bigint)"
        )

    score_exprs = []
    for lang, words in _STOPWORDS.items():
        score_exprs.append(" + ".join(cnt(w) for w in words) + f" AS s_{lang}")
    langs = list(_STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{k}" for k in langs) + ")"
    case = "CASE "
    for k in langs:
        case += f"WHEN s_{k} = {best} AND {best} > 0 THEN '{k}' "
    case += "ELSE 'und' END"
    cols = ", ".join(f"s_{k}" for k in langs)
    return f"""
        SELECT doc_id, {case} AS lang_pred, {cols}
        FROM (
          SELECT doc_id, {', '.join(score_exprs)}
          FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
        )
    """


def _host_rank_sql(iterations: int = 6, damping: int = 85, scale: int = 10**12) -> str:
    """Unrolled fixed-point PageRank recurrence (crawlspark.hostrank pinned
    semantics) — one CTE triple (contribs, dangling, ranks) per iteration.
    All arithmetic is BIGINT floor division, so the values are bit-identical
    to the Spark side regardless of partitioning or summation order."""
    parts = [f"""
        WITH edges AS (
            SELECT src, dst FROM (
                SELECT DISTINCT 'h' || CAST(doc_id % 50 AS VARCHAR) AS src,
                       'h' || CAST((doc_id * 7 + 1) % 50 AS VARCHAR) AS dst
                FROM documents WHERE doc_id < 500 AND (doc_id % 50) % 10 <> 0
                UNION
                SELECT 'h' || CAST(doc_id % 50 AS VARCHAR),
                       'h' || CAST((doc_id * 3 + 2) % 50 AS VARCHAR)
                FROM documents WHERE doc_id < 500 AND (doc_id % 50) % 10 <> 0
            ) WHERE src <> dst
        ),
        nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
        nn AS (SELECT count(*) AS c FROM nodes),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        r0 AS (SELECT host, CAST({scale} // nn.c AS BIGINT) AS rank
               FROM nodes CROSS JOIN nn)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
        c{k} AS (
            SELECT e.dst AS host, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS inflow
            FROM r{k - 1} r JOIN deg d ON d.src = r.host
            JOIN edges e ON e.src = r.host
            GROUP BY e.dst
        ),
        g{k} AS (
            SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang
            FROM r{k - 1} r LEFT JOIN deg d ON d.src = r.host
            WHERE d.src IS NULL
        ),
        r{k} AS (
            SELECT n.host, CAST(
                ((100 - {damping}) * ({scale} // nn.c)) // 100
                + ({damping} * (COALESCE(c.inflow, 0) + g.dang // nn.c)) // 100
                AS BIGINT) AS rank
            FROM nodes n LEFT JOIN c{k} c ON c.host = n.host
            CROSS JOIN g{k} g CROSS JOIN nn
        )""")
    parts.append(f"""
        SELECT host, rank FROM r{iterations} ORDER BY host""")
    return "".join(parts)


# closed form of _sitemap_bodies as the PARSER must see it: 3 surviving
# entries per host (the loc-less urlset entry is dropped)
_SITEMAP_ORACLE_BASE = """
    WITH sm AS (
        SELECT CAST(doc_id AS VARCHAR) AS d,
               lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0') AS day,
               TRY_CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE) AS p
        FROM documents WHERE doc_id < 400
    )
    SELECT 'site' || d AS host, 'url' AS kind,
           'https://site' || d || '.example.org/page/' || d AS loc,
           '2024-01-' || day AS lastmod, '' AS changefreq, p AS priority
    FROM sm
    UNION ALL
    SELECT 'site' || d, 'url', 'https://site' || d || '.example.org/extra',
           '', 'daily', CAST(NULL AS DOUBLE)
    FROM sm
    UNION ALL
    SELECT 'site' || d, 'sitemap',
           'https://site' || d || '.example.org/sitemap-2.xml',
           '2024-02-02', '', CAST(NULL AS DOUBLE)
    FROM sm
"""


def oracle_sql() -> dict[str, str]:
    return {
        "s01_filter_pushdown": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'purchase' AND value > 50
        """,
        "s02_union_distinct": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "s03_nested_projection": """
            SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events
        """,
        "s04_limit_offset": """
            SELECT o_orderkey, o_custkey FROM orders
            ORDER BY o_orderkey LIMIT 100 OFFSET 10
        """,
        "s05_sanitize": """
            SELECT c_custkey, regexp_replace(c_name, '[^a-zA-Z-]', '_', 'g') AS sanitized
            FROM customer
        """,
        "s06_fetch_join": """
            SELECT d.doc_id * 2 AS want_id,
                   (p.doc_id IS NOT NULL) AS has_page
            FROM documents d LEFT JOIN documents p ON d.doc_id * 2 = p.doc_id
        """,
        "s07_coalesce_fallback": """
            SELECT s_suppkey, coalesce(n_name, 'UNKNOWN') AS nation_name
            FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
              ON s_nationkey = n_nationkey
        """,
        "s11_try_cast": """
            SELECT l_orderkey, l_linenumber,
                   try_cast(cast(l_linenumber AS varchar) || '.5' AS double) AS good_cast,
                   try_cast(l_returnflag AS double) AS bad_cast
            FROM lineitem WHERE l_orderkey < 1000
        """,
        "s12_landing_coalesce": """
            SELECT doc_id,
                   coalesce(CASE WHEN lang = 'en' THEN NULL ELSE source END,
                            'https://landing.example?archive=' || doc_id) AS landing
            FROM documents
        """,
        "s14_dedup_firstseen": """
            SELECT user_id, event_id, ts FROM (
              SELECT user_id, event_id, ts,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "s14b_surrogate_keys": """
            SELECT user_id, first_ts,
                   row_number() OVER (ORDER BY first_ts, user_id) AS surrogate_key
            FROM (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
        """,
        "s15_point_wkt": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_discount IS NOT NULL AND l_tax IS NOT NULL
                        THEN printf('POINT(%.2f %.2f)', l_discount, l_tax) END AS geom_wkt
            FROM lineitem WHERE l_orderkey < 2000
        """,
        "s21_topk_sort": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
        """,
        "s22_exists_semijoin": """
            SELECT c_custkey,
                   (c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000))
                   AS has_big_order
            FROM customer
        """,
        "s22b_join3_revenue": """
            SELECT o_orderkey,
                   cast(sum(cast(l_extendedprice AS decimal(12,2)) *
                            (cast(1 AS decimal(4,2)) - cast(l_discount AS decimal(4,2))))
                        AS double) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND o_orderkey = l_orderkey
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "s23_agg_q1": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(cast(l_quantity AS decimal(12,2))) AS double) AS sum_qty,
                   cast(sum(cast(l_extendedprice AS decimal(12,2))) AS double) AS sum_base_price,
                   cast(sum(cast(l_extendedprice AS decimal(12,2)) *
                            (cast(1 AS decimal(4,2)) - cast(l_discount AS decimal(4,2))))
                        AS double) AS sum_disc_price,
                   cast(sum(cast(l_extendedprice AS decimal(12,2)) *
                            (cast(1 AS decimal(4,2)) - cast(l_discount AS decimal(4,2))) *
                            (cast(1 AS decimal(4,2)) + cast(l_tax AS decimal(4,2))))
                        AS double) AS sum_charge,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "s24_quarantine": """
            SELECT event_type,
                   CASE WHEN value IS NULL THEN 'null'
                        WHEN value > 90 THEN 'outlier' ELSE 'ok' END AS status,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "s25_anti_join": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "s26_politeness_topk": """
            SELECT user_id, event_id, rk FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
              FROM events
            ) WHERE rk <= 3
        """,
        "s28_counters": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "crawl_canonicalize": """
            SELECT doc_id,
                   'https://host' || (doc_id % 7) || '.example.org/p/' || doc_id
                   AS canonical_url
            FROM documents
        """,
        "crawl_robots_filter": """
            SELECT doc_id, '/p/' || doc_id AS path FROM documents
            WHERE NOT starts_with('/p/' || doc_id, '/p/9')
        """,
        "crawl_link_extract": """
            SELECT doc_id,
                   'https://host' || (doc_id % 7) || '.example.org/p/' || (doc_id + 1)
                   AS link
            FROM documents WHERE doc_id < 1000
            UNION ALL
            SELECT doc_id,
                   'https://host' || (doc_id % 7) || '.example.org/rel/' || doc_id
            FROM documents WHERE doc_id < 1000
        """,
        "crawl_robots_parse": """
            SELECT 'host' || doc_id AS host, p AS prefix,
                   CAST(1 + doc_id % 5 AS double) AS crawl_delay_s,
                   CAST(floor(60.0 / (1 + doc_id % 5)) AS int) AS max_per_round
            FROM documents, unnest(['/p/9', '/admin' || doc_id]) AS t(p)
            WHERE doc_id < 500
        """,
        # closed form: body lines are doc_id-prefixed (provably unique ⇒
        # always kept, in order); the two injected boilerplate lines are
        # shared corpus-wide ⇒ always removed. Raw texts contain no '. '
        # (checked), so the line structure is exactly as constructed.
        "line_dedup": """
            SELECT doc_id,
                   doc_id || ':' || substr(text, 1, 40) || '. ' ||
                   doc_id || '~' || substr(text, 41, 40) AS text,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS bigint) AS n_lines,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS bigint) AS n_removed
            FROM documents WHERE doc_id < 2000
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
                   count(*) AS n_copies
            FROM (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
            )
            GROUP BY md5(text) HAVING count(*) > 1
            ORDER BY keep_doc_id
        """,
        "dedup_clusters": """
            SELECT doc_id, cluster_id, (doc_id = cluster_id) AS is_keeper FROM (
              SELECT DISTINCT node AS doc_id, node - (node % 10) AS cluster_id
              FROM (
                SELECT doc_id AS node FROM documents WHERE doc_id % 10 < 3
                UNION
                SELECT doc_id + 1 FROM documents WHERE doc_id % 10 < 3
              )
            )
        """,
        "ngram_jaccard": """
            SELECT a.doc_id AS a_id,
                   len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                      list_distinct(string_split(b.text, ' ')))) AS n_inter,
                   len(list_distinct(list_concat(string_split(a.text, ' '),
                                                 string_split(b.text, ' ')))) AS n_union,
                   round(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                            list_distinct(string_split(b.text, ' ')))) * 1.0 /
                         len(list_distinct(list_concat(string_split(a.text, ' '),
                                                       string_split(b.text, ' ')))), 6) AS jaccard
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        """,
        "ann_bruteforce": """
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                                  embedding,
                                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                                vec_id ASC) AS rank
              FROM embeddings WHERE vec_id <> 0
            ) WHERE rank <= 10
        """,
        "ann_knn_join": """
            SELECT q_id, vec_id, rank FROM (
              SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
                                c.vec_id ASC) AS rank
              FROM embeddings c, embeddings q
              WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
            ) WHERE rank <= 5
        """,
        "gopher_quality": """
            SELECT doc_id,
                   cast(nw AS bigint) AS n_words,
                   round(length(text) * 1.0 / nw, 6) AS mean_word_len,
                   cast(aw AS bigint) AS alpha_words,
                   round(aw * 1.0 / nw, 6) AS alpha_word_ratio,
                   cast(sh AS bigint) AS stopword_hits,
                   (nw >= 20 AND nw <= 100000) AS ok_word_count,
                   (length(text) * 1.0 / nw >= 3.0 AND length(text) * 1.0 / nw <= 10.0)
                     AS ok_mean_word_len,
                   (aw * 1.0 / nw >= 0.8) AS ok_alpha_ratio,
                   (sh >= 2) AS ok_stopwords,
                   ((nw >= 20 AND nw <= 100000)
                    AND (length(text) * 1.0 / nw >= 3.0 AND length(text) * 1.0 / nw <= 10.0)
                    AND (aw * 1.0 / nw >= 0.8)
                    AND (sh >= 2)) AS keep
            FROM (
              SELECT doc_id, text,
                     len(string_split(text, ' ')) AS nw,
                     len(list_filter(string_split(text, ' '),
                                     w -> regexp_matches(w, '[a-zA-Z]'))) AS aw,
                     cast((length(p) - length(replace(p, ' the ', ''))) / 5 AS bigint)
                     + cast((length(p) - length(replace(p, ' and ', ''))) / 5 AS bigint)
                     + cast((length(p) - length(replace(p, ' of ', ''))) / 4 AS bigint)
                     + cast((length(p) - length(replace(p, ' to ', ''))) / 4 AS bigint)
                     + cast((length(p) - length(replace(p, ' in ', ''))) / 4 AS bigint) AS sh
              FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)
            )
        """,
        "lang_id": _lang_id_sql(),
        "quality_score": """
            SELECT doc_id,
                   cast(length(text) AS bigint) AS n_chars_m,
                   cast(len(string_split(text, ' ')) AS bigint) AS n_words,
                   round(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS mean_word_len,
                   cast((length(p) - length(replace(p, ' the ', ''))) / 5
                        + (length(p) - length(replace(p, ' and ', ''))) / 5
                        + (length(p) - length(replace(p, ' of ', ''))) / 4 AS bigint)
                        AS stopword_hits,
                   round(cast((length(p) - length(replace(p, ' the ', ''))) / 5
                        + (length(p) - length(replace(p, ' and ', ''))) / 5
                        + (length(p) - length(replace(p, ' of ', ''))) / 4 AS bigint) * 1.0
                        / len(string_split(text, ' ')), 6) AS stopword_ratio
            FROM (SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents)
        """,
        "token_count": """
            SELECT doc_id,
                   cast(len(string_split(text, ' ')) AS bigint) AS ws_tokens,
                   cast(ceil(length(text) / 4.0) AS bigint) AS bpe_est_tokens
            FROM documents
        """,
        "fingerprint": """
            SELECT doc_id, md5(text) AS md5_fp FROM documents
        """,
        # n-gram construction mirrors shingles_expr exactly: len(w)>=5 ⇒
        # positional 5-grams; shorter ⇒ one whole-text gram (same CASE edge)
        "decontaminate": """
            WITH tok AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(w) >= 5
                            THEN array_to_string(list_slice(w, i, i + 4), ' ')
                            ELSE array_to_string(w, ' ') END AS gram
                FROM tok, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
            ),
            bg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
            cont AS (
                SELECT DISTINCT g.doc_id FROM grams g JOIN bg USING (gram)
            )
            SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
            FROM documents d LEFT JOIN cont c USING (doc_id)
            ORDER BY doc_id
        """,
        "domain_quota": """
            SELECT doc_id, domain FROM (
                SELECT doc_id, source AS domain,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id ASC
                       ) AS r
                FROM documents
            ) WHERE r <= 20 ORDER BY doc_id
        """,
        "split_assign": """
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 5 THEN 'test'
                        WHEN bucket < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM (
                SELECT doc_id,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                           % 100 AS bucket
                FROM documents
            ) ORDER BY doc_id
        """,
        # duplicate-line + top-n-gram repetition features recomputed the
        # textbook way (unnest + GROUP BY) — an independent formulation of
        # the same pinned definitions as the shuffle-free fold
        "repetition_rules": """
            WITH lines AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                FROM documents
            ),
            lstats AS (
                SELECT doc_id, count(*) AS n_lines,
                       count(*) - count(DISTINCT l) AS dup_lines,
                       sum(length(l)) AS line_chars
                FROM lines GROUP BY doc_id
            ),
            ldup AS (
                SELECT doc_id, sum((c - 1) * length(l)) AS dup_line_chars
                FROM (SELECT doc_id, l, count(*) AS c
                      FROM lines GROUP BY doc_id, l)
                GROUP BY doc_id
            ),
            tok AS (
                SELECT doc_id, string_split(text, ' ') AS w,
                       length(text) AS n_chars
                FROM documents
            ),
            g2 AS (
                SELECT doc_id, max(c * length(g)) AS best FROM (
                    SELECT doc_id,
                           array_to_string(list_slice(w, i, i + 1), ' ') AS g,
                           count(*) AS c
                    FROM tok, unnest(generate_series(1, len(w) - 1)) AS t(i)
                    GROUP BY doc_id, g HAVING count(*) >= 2
                ) GROUP BY doc_id
            ),
            g3 AS (
                SELECT doc_id, max(c * length(g)) AS best FROM (
                    SELECT doc_id,
                           array_to_string(list_slice(w, i, i + 2), ' ') AS g,
                           count(*) AS c
                    FROM tok, unnest(generate_series(1, len(w) - 2)) AS t(i)
                    GROUP BY doc_id, g HAVING count(*) >= 2
                ) GROUP BY doc_id
            ),
            feat AS (
                SELECT t.doc_id,
                       ls.n_lines, ls.dup_lines,
                       round(ls.dup_lines * 1.0 / ls.n_lines, 6) AS dup_line_frac,
                       round(CASE WHEN ls.line_chars > 0
                             THEN coalesce(ld.dup_line_chars, 0) * 1.0 / ls.line_chars
                             ELSE 0.0 END, 6) AS dup_line_char_frac,
                       round(CASE WHEN t.n_chars > 0
                             THEN coalesce(g2.best, 0) * 1.0 / t.n_chars
                             ELSE 0.0 END, 6) AS top2gram_char_frac,
                       round(CASE WHEN t.n_chars > 0
                             THEN coalesce(g3.best, 0) * 1.0 / t.n_chars
                             ELSE 0.0 END, 6) AS top3gram_char_frac
                FROM tok t
                JOIN lstats ls USING (doc_id)
                LEFT JOIN ldup ld USING (doc_id)
                LEFT JOIN g2 ON g2.doc_id = t.doc_id
                LEFT JOIN g3 ON g3.doc_id = t.doc_id
            )
            SELECT doc_id, n_lines, dup_lines, dup_line_frac,
                   dup_line_char_frac, top2gram_char_frac, top3gram_char_frac,
                   dup_line_frac <= 0.30 AS ok_dup_lines,
                   dup_line_char_frac <= 0.20 AS ok_dup_line_chars,
                   top2gram_char_frac <= 0.20 AS ok_top2gram,
                   top3gram_char_frac <= 0.18 AS ok_top3gram,
                   (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
                    AND top2gram_char_frac <= 0.20
                    AND top3gram_char_frac <= 0.18) AS keep
            FROM feat ORDER BY doc_id
        """,
        # identical footer construction + the identical Java/RE2-common
        # patterns, applied in the same pinned order (email → IP → phone)
        "pii_redact": """
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                       || '@example.com at 10.0.0.'
                       || CAST(doc_id % 256 AS VARCHAR)
                       || CASE WHEN doc_id % 3 = 0
                               THEN ' tel 555-01' || CAST(doc_id % 10 AS VARCHAR)
                                    || '-4242'
                               ELSE '' END AS text
                FROM documents
            ),
            e AS (
                SELECT doc_id, text,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM aug
            ),
            i AS (
                SELECT doc_id, n_emails,
                       len(regexp_extract_all(t1,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
                       regexp_replace(t1,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                           '<IP>', 'g') AS t2
                FROM e
            )
            SELECT doc_id, n_emails, n_ips,
                   len(regexp_extract_all(t2, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS n_phones,
                   regexp_replace(t2, '\\b\\d{3}-\\d{3}-\\d{4}\\b',
                                  '<PHONE>', 'g') AS redacted
            FROM i ORDER BY doc_id
        """,
        "pack_sequences": """
            SELECT doc_id, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS start_offset,
                   CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_index
            FROM (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       sum(len(string_split(text, ' ')))
                           OVER (ORDER BY doc_id) AS cum
                FROM documents
            ) ORDER BY doc_id
        """,
        # the WHOLE curation chain as one WITH-query: gates → exact dedup →
        # decontamination → domain quota → split (validates the composition,
        # not just each stage)
        "pipeline_training_set": """
            WITH feat AS (
              SELECT doc_id, text, source, n_chars,
                     len(string_split(text, ' ')) AS nw,
                     len(list_filter(string_split(text, ' '),
                                     w -> regexp_matches(w, '[a-zA-Z]'))) AS aw,
                     cast((length(p) - length(replace(p, ' the ', ''))) / 5 AS bigint)
                     + cast((length(p) - length(replace(p, ' and ', ''))) / 5 AS bigint)
                     + cast((length(p) - length(replace(p, ' of ', ''))) / 4 AS bigint)
                     + cast((length(p) - length(replace(p, ' to ', ''))) / 4 AS bigint)
                     + cast((length(p) - length(replace(p, ' in ', ''))) / 4 AS bigint) AS sh
              FROM (SELECT doc_id, text, source, n_chars,
                           ' ' || text || ' ' AS p FROM documents)
            ),
            gated AS (
              SELECT doc_id, text, source, n_chars FROM feat
              WHERE nw >= 20 AND nw <= 100000
                AND length(text) * 1.0 / nw >= 3.0
                AND length(text) * 1.0 / nw <= 10.0
                AND aw * 1.0 / nw >= 0.8 AND sh >= 2
            ),
            keepers AS (
              SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)
            ),
            uniq AS (SELECT gated.* FROM gated JOIN keepers USING (doc_id)),
            tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM uniq),
            btok AS (
              SELECT string_split(text, ' ') AS w FROM documents
              WHERE doc_id % 97 = 0
            ),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 5
                          THEN array_to_string(list_slice(w, i, i + 4), ' ')
                          ELSE array_to_string(w, ' ') END AS gram
              FROM tok, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
            ),
            bgrams AS (
              SELECT DISTINCT
                     CASE WHEN len(w) >= 5
                          THEN array_to_string(list_slice(w, i, i + 4), ' ')
                          ELSE array_to_string(w, ' ') END AS gram
              FROM btok, unnest(generate_series(1, greatest(len(w) - 4, 1))) AS t(i)
            ),
            cont AS (
              SELECT DISTINCT grams.doc_id FROM grams JOIN bgrams USING (gram)
            ),
            clean AS (
              SELECT * FROM uniq
              WHERE doc_id NOT IN (SELECT doc_id FROM cont)
            ),
            quota AS (
              SELECT doc_id, domain FROM (
                SELECT doc_id, source AS domain,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id ASC
                       ) AS r
                FROM clean
              ) WHERE r <= 20
            )
            SELECT doc_id, domain,
                   CASE WHEN b < 5 THEN 'test'
                        WHEN b < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM (
              SELECT doc_id, domain,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                         % 100 AS b
              FROM quota
            ) ORDER BY doc_id
        """,
        # xxhash64-based sketches and the pandas-UDF extraction are not
        # ANSI-SQL-expressible; their oracles are INDEPENDENT pure-Python
        # mirrors (tools/make_fixtures.py — xxhash64_py + Java int semantics,
        # same strategy as tests/oracle_sim.py and the reference's golden
        # fixtures, abcd_parser.rs:232-298) materialized as parquet for the
        # sf0.01 correctness gate and read here via read_parquet.
        "extraction_units": f"""
            SELECT url, member_index, unit_index, unit_id, lon
            FROM read_parquet('{_FIXTURES}/extraction_units.parquet')
        """,
        # closed form: the three in-query archives pin the sniff outcome
        "extraction_version": """
            SELECT url, abcd_version FROM (VALUES
                ('http://v/206', '2.06'),
                ('http://v/210', '2.1'),
                ('http://v/none', CAST(NULL AS VARCHAR))
            ) AS t(url, abcd_version)
            ORDER BY url
        """,
        "dedup_minhash": f"""
            SELECT a, b, jaccard FROM read_parquet('{_FIXTURES}/dedup_minhash.parquet')
        """,
        "dedup_simhash": f"""
            SELECT a, b, hamming FROM read_parquet('{_FIXTURES}/dedup_simhash.parquet')
        """,
        "ann_lsh": f"""
            SELECT vec_id, rank FROM read_parquet('{_FIXTURES}/ann_lsh.parquet')
        """,
        "ann_ivf": f"""
            SELECT vec_id, rank FROM read_parquet('{_FIXTURES}/ann_ivf.parquet')
        """,
        "ann_ivf_kmeans": f"""
            SELECT vec_id, rank FROM read_parquet('{_FIXTURES}/ann_ivf_kmeans.parquet')
        """,
        "embed_neardup": f"""
            SELECT a, b FROM read_parquet('{_FIXTURES}/embed_neardup.parquet')
        """,
        "fingerprint_winnow": f"""
            SELECT doc_id, fp FROM read_parquet('{_FIXTURES}/fingerprint_winnow.parquet')
        """,
        # the composed curation chain is mirrored END-TO-END in pure Python
        # (tools/make_fixtures.py pipeline_curate_fixture: gopher gates →
        # minhash pairs → union-find CC → survivors → token counts)
        "pipeline_curate": f"""
            SELECT doc_id, ws_tokens, bpe_est_tokens
            FROM read_parquet('{_FIXTURES}/pipeline_curate.parquet')
        """,
        # the multimodal stub decoder is a deterministic function of the
        # payload BYTE LENGTH only (no byte/encoding assumptions)
        "multimodal_image": """
            SELECT doc_id,
                   CAST(1 + octet_length(encode(text)) % 64 AS int) AS width,
                   CAST(1 + (octet_length(encode(text)) // 64) % 64 AS int) AS height,
                   CAST(octet_length(encode(text)) AS bigint) AS n_bytes,
                   'stub' AS decoder
            FROM documents
        """,
        # real-PNG roundtrip: decoded dims/mode must equal the encode
        # parameters, which are pure functions of doc_id
        "multimodal_png": """
            SELECT doc_id,
                   CAST(1 + doc_id % 64 AS int) AS width,
                   CAST(1 + (doc_id // 64) % 64 AS int) AS height,
                   'L' AS mode,
                   'real-png' AS decoder
            FROM documents WHERE doc_id < 200
        """,
        # real-WAV roundtrip: rate = 8000*(1+id%3), n = 64+id%129, sample j =
        # ((id*31 + j*j) % 20001) - 10000; rms = sqrt(sum(x^2)/n) — integer
        # sums are exact in f64 on both engines, so sqrt agrees bit-for-bit
        "multimodal_wav": """
            SELECT doc_id,
                   CAST(8000 * (1 + doc_id % 3) AS int) AS sample_rate,
                   CAST(1 AS int) AS channels,
                   CAST(n AS bigint) AS n_samples,
                   CAST(n * 1000 // (8000 * (1 + doc_id % 3)) AS bigint) AS duration_ms,
                   sqrt(ss / n) AS rms,
                   'real-wav' AS decoder
            FROM (
              SELECT doc_id, 64 + doc_id % 129 AS n,
                     (SELECT sum(CAST(((doc_id * 31 + j * j) % 20001) - 10000 AS double) *
                                 CAST(((doc_id * 31 + j * j) % 20001) - 10000 AS double))
                      FROM unnest(generate_series(0, 64 + doc_id % 129 - 1)) AS t(j)) AS ss
              FROM documents WHERE doc_id < 200
            )
        """,
        "multimodal_frames": """
            SELECT doc_id, CAST(fi AS int) AS frame_index,
                   CAST(least(16, n - fi * 16) AS bigint) AS frame_bytes,
                   CAST(NULL AS int) AS width, CAST(NULL AS int) AS height,
                   'stub' AS splitter
            FROM (
              SELECT doc_id, octet_length(encode(text)) AS n,
                     unnest(generate_series(
                       0, greatest(octet_length(encode(text)) // 16, 1) - 1, 2)) AS fi
              FROM documents WHERE doc_id < 50
            )
        """,
        # real-GIF roundtrip: per-frame byte span = descriptor(10) + min-code
        # byte(1) + LZW payload L + sub-block framing (ceil(L/255) length
        # bytes + terminator), with L = npix + (npix-1)//110 clears + clear +
        # end — all closed forms of the encode parameters (see
        # crawlspark/multimodal.py gif_encode_frames / _gif_lzw_uncompressed)
        "multimodal_avi": """
            SELECT doc_id, CAST(fi AS int) AS frame_index,
                   CAST(w * h AS bigint) AS frame_bytes,
                   CAST(w AS int) AS width, CAST(h AS int) AS height,
                   'real-avi' AS splitter
            FROM (
              SELECT doc_id, w, h,
                     unnest(generate_series(0, doc_id % 6, 2)) AS fi
              FROM (
                SELECT doc_id, 1 + doc_id % 32 AS w, 1 + (doc_id // 32) % 32 AS h
                FROM documents WHERE doc_id < 200
              )
            )
        """,
        "multimodal_gif": """
            SELECT doc_id, CAST(fi AS int) AS frame_index,
                   CAST(12 + L + (L + 254) // 255 AS bigint) AS frame_bytes,
                   CAST(w AS int) AS width, CAST(h AS int) AS height,
                   'real-gif' AS splitter
            FROM (
              SELECT doc_id, w, h,
                     w * h + (w * h - 1) // 110 + 2 AS L,
                     unnest(generate_series(0, doc_id % 5, 2)) AS fi
              FROM (
                SELECT doc_id, 1 + doc_id % 16 AS w, 1 + (doc_id // 16) % 16 AS h
                FROM documents WHERE doc_id < 200
              )
            )
        """,
        # full textbook recomputation of the window-relaxed ExactSubstr
        # dedup: same text construction, same md5 window hashes, keeper =
        # first (doc_id, widx) per duplicated hash via row_number
        "substring_dedup": """
            WITH base AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN uniq || ' ' || '{shared}'
                            ELSE uniq END AS text
                FROM (
                    SELECT doc_id, array_to_string(list_transform(
                        generate_series(0, 11 + CAST(doc_id % 3 AS BIGINT)),
                        j -> 'u' || CAST(doc_id AS VARCHAR) || 'x'
                             || CAST(j AS VARCHAR)), ' ') AS uniq
                    FROM documents WHERE doc_id < 600
                )
            ),
            toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
            wins AS (
                SELECT doc_id, CAST(i AS INT) AS widx,
                       md5(array_to_string(
                           list_slice(w, i * 4 + 1, i * 4 + 8), ' ')) AS h
                FROM toks,
                     unnest(generate_series(0, (len(w) - 8) // 4)) AS t(i)
                WHERE len(w) >= 8
            ),
            marked AS (
                SELECT doc_id, widx,
                       row_number() OVER (PARTITION BY h
                                          ORDER BY doc_id, widx) AS rn,
                       count(*) OVER (PARTITION BY h) AS c
                FROM wins
            ),
            dups AS (SELECT doc_id, widx FROM marked WHERE c >= 2 AND rn > 1),
            flags AS (
                SELECT t.doc_id, t.pos, t.tok,
                       EXISTS (SELECT 1 FROM dups d
                               WHERE d.doc_id = t.doc_id
                                 AND d.widx * 4 <= t.pos
                                 AND t.pos < d.widx * 4 + 8) AS rm
                FROM (
                    SELECT doc_id, CAST(j - 1 AS INT) AS pos,
                           w[CAST(j AS INT)] AS tok
                    FROM toks, unnest(generate_series(1, len(w))) AS u(j)
                ) t
            ),
            agg AS (
                SELECT doc_id,
                       COALESCE(string_agg(tok, ' ' ORDER BY pos)
                                FILTER (WHERE NOT rm), '') AS text,
                       CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(count(*) FILTER (WHERE rm) AS BIGINT) AS n_removed
                FROM flags GROUP BY doc_id
            ),
            dwc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
                    FROM dups GROUP BY doc_id)
            SELECT a.doc_id, a.text, a.n_tokens, a.n_removed,
                   COALESCE(w.n_dup_windows, CAST(0 AS BIGINT)) AS n_dup_windows
            FROM agg a LEFT JOIN dwc w ON w.doc_id = a.doc_id
            ORDER BY a.doc_id
        """.replace("{shared}", " ".join(f"s{k}" for k in range(14))),
        # add-one bigram LM on the integer fixed-point axis (scale 1e9):
        # every term is ((c2+1)*1e9) // (c1+V) over exact long counts, so
        # the sum is associative and order-independent on both engines
        "lm_likelihood": """
            WITH tok AS (
                SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents
            ),
            bg AS (
                SELECT doc_id,
                       struct_extract(u.z, 1) AS w1,
                       struct_extract(u.z, 2) AS w2
                FROM tok,
                     unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS u(z)
            ),
            cnt1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
            cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
            voc AS (
                SELECT count(DISTINCT t.tok) AS v
                FROM (SELECT unnest(w) AS tok FROM tok) t
            ),
            lik AS (
                SELECT bg.doc_id,
                       ((c2 + 1) * 1000000000) // (c1 + v) AS lik
                FROM bg JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
                     CROSS JOIN voc
            ),
            agg AS (
                SELECT doc_id, count(*) AS nb,
                       CAST(sum(lik) AS BIGINT) AS s
                FROM lik GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(s, 0) AS BIGINT) AS lm_score_sum,
                   CAST(CASE WHEN COALESCE(nb, 0) = 0 THEN 0
                             ELSE s // nb END AS BIGINT) AS lm_score_mean
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
            ORDER BY d.doc_id
        """,
        # quantized-histogram CCNet thirds over the lm_likelihood scores —
        # same integer cuts (3*above < n / < 2n) on q = mean div 1e5
        "lm_buckets": """
            WITH tok AS (
                SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents
            ),
            bg AS (
                SELECT doc_id,
                       struct_extract(u.z, 1) AS w1,
                       struct_extract(u.z, 2) AS w2
                FROM tok,
                     unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS u(z)
            ),
            cnt1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
            cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
            voc AS (
                SELECT count(DISTINCT t.tok) AS v
                FROM (SELECT unnest(w) AS tok FROM tok) t
            ),
            lik AS (
                SELECT bg.doc_id,
                       ((c2 + 1) * 1000000000) // (c1 + v) AS lik
                FROM bg JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
                     CROSS JOIN voc
            ),
            agg AS (
                SELECT doc_id, count(*) AS nb,
                       CAST(sum(lik) AS BIGINT) AS s
                FROM lik GROUP BY doc_id
            ),
            scored AS (
                SELECT d.doc_id, d.lang,
                       CAST(CASE WHEN COALESCE(nb, 0) = 0 THEN 0
                                 ELSE s // nb END AS BIGINT) AS lm_score_mean
                FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
            ),
            qd AS (
                SELECT doc_id, lang, lm_score_mean,
                       lm_score_mean // 100000 AS q
                FROM scored
            ),
            hist AS (SELECT lang, q, count(*) AS c FROM qd GROUP BY lang, q),
            cuts AS (
                SELECT lang, q,
                       COALESCE(sum(c) OVER (
                           PARTITION BY lang ORDER BY q DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS above,
                       sum(c) OVER (PARTITION BY lang) AS n
                FROM hist
            )
            SELECT qd.doc_id, qd.lang, qd.lm_score_mean,
                   CASE WHEN above * 3 < n THEN 'head'
                        WHEN above * 3 < n * 2 THEN 'middle'
                        ELSE 'tail' END AS ppl_bucket
            FROM qd JOIN cuts ON qd.lang = cuts.lang AND qd.q = cuts.q
            ORDER BY qd.doc_id
        """,
        # identical regexp chain over the same synthesized HTML (patterns
        # stay in the Java-RE2 common subset; e'\n' = the literal newline
        # Spark's replacement strings produce; chr(39) = the apostrophe)
        "html_to_text": """
            WITH raw AS (
                SELECT doc_id,
                       '<html><head><title>t</title><style>x{color:red}</style>'
                       || '<script>var a=1;</script></head><body><p>'
                       || text
                       || '</p><div>A &amp;amp; B &lt;tag&gt;</div><!-- note -->'
                       || '<ul><li>one</li><li>two</li></ul><br/>end</body></html>'
                       AS s
                FROM raw0
            ),
            st AS (
                SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(
                              regexp_replace(s, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                            '(?s)<!--.*?-->', ' ', 'g'),
                          '(?i)</(p|div|li|tr|h[1-6]|br)>|<br[^>]*>', e'\n', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
                    '[ \t]+', ' ', 'g'),
                    e' ?\n ?', e'\n', 'g'),
                    e'\n{2,}', e'\n', 'g'),
                    '^\s+|\s+$', '', 'g') AS text
                FROM raw
            )
            SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
            FROM st ORDER BY doc_id
        """.replace("FROM raw0", "FROM documents"),
        "term_postings": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '([a-z0-9]+)', 1))
                           AS term
                FROM documents
            ),
            tf AS (
                SELECT term, doc_id, count(*) AS tf
                FROM toks GROUP BY term, doc_id
            ),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
            SELECT term, doc_id,
                   CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df,
                   CAST(n_docs AS BIGINT) AS n_docs
            FROM tf JOIN dfq USING (term) CROSS JOIN nd
            ORDER BY term, doc_id
        """,
        # closed form: the WET text of the synthesized archive is exactly
        # text || '\ntail & x' (documents.text verified free of multi-space
        # / tag / entity bytes at sf0.01 and sf0.1); gates mirror
        # gopher_quality_rules over that text
        "pipeline_warc_wet": """
            WITH wet AS (
                SELECT 'https://w' || CAST(doc_id AS VARCHAR)
                           || '.example.org/p' AS url,
                       text || e'\ntail & x' AS text
                FROM documents WHERE doc_id < 300
            ),
            feat AS (
                SELECT url, text,
                       len(string_split(text, ' ')) AS nw,
                       len(list_filter(string_split(text, ' '),
                                       w -> regexp_matches(w, '[a-zA-Z]'))) AS aw,
                       cast((length(p) - length(replace(p, ' the ', ''))) / 5 AS bigint)
                       + cast((length(p) - length(replace(p, ' and ', ''))) / 5 AS bigint)
                       + cast((length(p) - length(replace(p, ' of ', ''))) / 4 AS bigint)
                       + cast((length(p) - length(replace(p, ' to ', ''))) / 4 AS bigint)
                       + cast((length(p) - length(replace(p, ' in ', ''))) / 4 AS bigint)
                           AS sh
                FROM (SELECT url, text, ' ' || text || ' ' AS p FROM wet)
            )
            SELECT url, text,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(nw AS BIGINT) AS n_words,
                   ((nw >= 20 AND nw <= 100000)
                    AND (length(text) * 1.0 / nw >= 3.0
                         AND length(text) * 1.0 / nw <= 10.0)
                    AND (aw * 1.0 / nw >= 0.8)
                    AND (sh >= 2)) AS keep
            FROM feat ORDER BY url
        """,
        # Sitemap directives in closed form: every body yields its /m{id}
        # map (comment stripped), doc_id%3==0 adds /extra.xml; empty-value
        # and noise lines contribute nothing
        "crawl_robots_sitemaps": """
            SELECT 'host' || (doc_id % 9) || '.example.org' AS host,
                   sm AS sitemap_url
            FROM (
                SELECT doc_id,
                       'https://s' || (doc_id % 9) || '.example.org/m'
                           || doc_id || '.xml' AS sm
                FROM documents WHERE doc_id < 400
                UNION ALL
                SELECT doc_id,
                       'https://s' || (doc_id % 9) || '.example.org/extra.xml'
                FROM documents WHERE doc_id < 400 AND doc_id % 3 = 0
            )
            ORDER BY host, sitemap_url
        """,
        # lag-window mirror of change_rates + integer tier cuts; duplicate
        # (url, round) retries collapse to min fingerprint first
        "recrawl_priorities": """
            WITH hist AS (
                SELECT 'https://h.org/p/' || (doc_id % 120) AS url,
                       CAST((doc_id // 120) % 4 AS INT) AS round,
                       'fp' || (((doc_id * 13) // 7) % 3) AS fingerprint
                FROM documents
            ),
            obs AS (
                SELECT url, round, min(fingerprint) AS fp
                FROM hist GROUP BY url, round
            ),
            marked AS (
                SELECT url, round,
                       CASE WHEN lag(fp) OVER w IS NULL THEN 0 ELSE 1 END
                           AS has_prev,
                       CASE WHEN lag(fp) OVER w IS NOT NULL
                                 AND fp <> lag(fp) OVER w
                            THEN 1 ELSE 0 END AS changed
                FROM obs
                WINDOW w AS (PARTITION BY url ORDER BY round)
            ),
            rates AS (
                SELECT url,
                       CAST(count(*) AS BIGINT) AS observations,
                       CAST(sum(has_prev) AS BIGINT) AS intervals,
                       CAST(sum(changed) AS BIGINT) AS changes,
                       max(round) AS last_round
                FROM marked GROUP BY url
            )
            SELECT url, observations, intervals, changes, last_round,
                   CAST(CASE WHEN intervals = 0 THEN 2
                             WHEN changes * 100 >= intervals * 50 THEN 0
                             WHEN changes * 100 >= intervals * 10 THEN 1
                             ELSE 3 END AS INT) AS recrawl_priority
            FROM rates ORDER BY url
        """,
        # closed-form resolved edges of q_anchor_text_index's synthetic
        # HTML (mailto: dropped), re-aggregated identically
        "anchor_text_index": """
            WITH e AS (
                SELECT 'host' || (doc_id % 7) || '.example.org' AS src_host,
                       'https://t' || (doc_id % 5) || '.example.org/x' AS url,
                       'anchor ' || (doc_id % 3) AS anchor
                FROM documents
                UNION ALL
                SELECT 'host' || (doc_id % 7) || '.example.org',
                       'https://host' || (doc_id % 7) || '.example.org/rel/'
                           || (doc_id % 4),
                       'self ' || (doc_id % 2)
                FROM documents
            ),
            totals AS (
                SELECT url, count(*) AS n_inlinks,
                       count(DISTINCT src_host) AS n_source_hosts
                FROM e GROUP BY url
            ),
            pa AS (SELECT url, anchor, count(*) AS cnt FROM e GROUP BY url, anchor),
            top AS (
                SELECT url, anchor, cnt,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY cnt DESC, anchor ASC) AS rn
                FROM pa
            )
            SELECT t.url,
                   CAST(t.n_inlinks AS BIGINT) AS n_inlinks,
                   CAST(t.n_source_hosts AS BIGINT) AS n_source_hosts,
                   top.anchor AS top_anchor,
                   CAST(top.cnt AS BIGINT) AS top_anchor_count
            FROM totals t JOIN top ON t.url = top.url AND top.rn = 1
            ORDER BY t.url
        """,
        # URL-shape mirror of q_crawl_trap_detect: hosts 0-2 carry trap
        # patterns (segment repeats / depth 10 / 5 params), 3-6 are clean
        "crawl_trap_detect": """
            WITH u AS (
                SELECT 'host' || (doc_id % 7) || '.example.org' AS host,
                       CASE WHEN doc_id % 7 < 3 THEN
                         CASE doc_id % 3
                           WHEN 0 THEN '/a/b/a/b/a/b/' || doc_id
                           WHEN 1 THEN '/d1/d2/d3/d4/d5/d6/d7/d8/d9/' || doc_id
                           ELSE '/p/' || doc_id || '?a=1&b=2&c=3&d=4&e=5'
                         END
                       ELSE '/p/' || doc_id END AS pq
                FROM documents
            ),
            feat AS (
                SELECT host,
                       CASE WHEN length(p) = 0 THEN 0
                            ELSE length(p) - length(replace(p, '/', '')) + 1
                       END AS depth,
                       CASE WHEN q IS NULL OR length(q) = 0 THEN 0
                            ELSE length(q) - length(replace(q, '&', '')) + 1
                       END AS n_params,
                       COALESCE(list_max(list_transform(segs,
                           s -> len(list_filter(segs, x -> x = s)))), 0)
                       AS seg_repeat
                FROM (
                    SELECT host,
                           string_split(pq, '?')[1][2:] AS p,
                           CASE WHEN position('?' IN pq) > 0
                                THEN string_split(pq, '?')[2] ELSE NULL
                           END AS q,
                           list_filter(
                               string_split(string_split(pq, '?')[1][2:], '/'),
                               s -> length(s) > 0) AS segs
                    FROM u
                )
            )
            SELECT host,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(sum(depth) AS BIGINT) AS sum_depth,
                   CAST(max(depth) AS BIGINT) AS max_depth,
                   CAST(max(seg_repeat) AS BIGINT) AS max_seg_repeat,
                   CAST(sum(CASE WHEN depth > 8 OR seg_repeat > 2
                                      OR n_params > 4
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_trap_urls,
                   sum(CASE WHEN depth > 8 OR seg_repeat > 2 OR n_params > 4
                            THEN 1 ELSE 0 END) * 100 > count(*) * 50 AS trap
            FROM feat GROUP BY host ORDER BY host
        """,
        # resolved host edges in closed form: one cross-host link per doc
        # (host doc%7 -> t doc%5), the root-relative and own-host links are
        # self-edges and drop; DISTINCT collapses repeats
        "crawl_host_graph": """
            SELECT DISTINCT
                   'host' || (doc_id % 7) || '.example.org' AS src,
                   't' || (doc_id % 5) || '.example.org' AS dst
            FROM documents
            ORDER BY src, dst
        """,
        "host_rank": _host_rank_sql(iterations=6),
        # closed form of the parsed WARC archives: two records per doc —
        # the response (HTTP unwrapped, status 200) and the metadata record
        # (raw payload, NULL status); every 10th payload embeds 'WARC/1.0'
        "crawl_warc_parse": """
            WITH wd AS (
                SELECT CAST(doc_id AS VARCHAR) AS d,
                       '<html>doc' || CAST(doc_id AS VARCHAR)
                       || CASE WHEN doc_id % 10 = 0 THEN ' WARC/1.0' ELSE '' END
                       || '</html>' AS payload
                FROM documents WHERE doc_id < 300
            )
            SELECT 'w' || d AS src, 0 AS record_index,
                   'response' AS warc_type,
                   'https://w' || d || '.example.org/p' AS target_uri,
                   '2024-01-02T03:04:05Z' AS warc_date,
                   200 AS http_status, payload AS payload_text,
                   CAST(length(payload) AS BIGINT) AS payload_len,
                   CAST(NULL AS VARCHAR) AS error
            FROM wd
            UNION ALL
            SELECT 'w' || d, 1, 'metadata',
                   'https://w' || d || '.example.org/p',
                   '2024-01-02T03:04:06Z',
                   CAST(NULL AS INT), 'meta' || d,
                   CAST(length('meta' || d) AS BIGINT),
                   CAST(NULL AS VARCHAR)
            FROM wd
            ORDER BY src, record_index
        """,
        "crawl_warc_pages": """
            SELECT 'https://w' || CAST(doc_id AS VARCHAR)
                       || '.example.org/p' AS url,
                   TIMESTAMP '2024-01-02 03:04:05' AS warc_ts,
                   '<html>doc' || CAST(doc_id AS VARCHAR)
                   || CASE WHEN doc_id % 10 = 0 THEN ' WARC/1.0' ELSE '' END
                   || '</html>' AS html_text,
                   CAST(NULL AS VARCHAR) AS text,
                   CAST(NULL AS VARCHAR) AS lang
            FROM documents WHERE doc_id < 300
            ORDER BY url
        """,
        "crawl_sitemap_parse": _SITEMAP_ORACLE_BASE
        + " ORDER BY host, kind, loc",
        # FRONTIER adaptation: priority 0.k -> 10-k (protocol default 0.5 ->
        # 5 for the priority-less entry), lastmod -> warc_ts, sitemapindex
        # rows excluded
        "crawl_sitemap_frontier": """
            WITH parsed AS ({base})
            SELECT loc AS url, CAST(NULL AS VARCHAR) AS host,
                   CAST(round((1.0 - COALESCE(priority, 0.5)) * 10) AS INT)
                       AS priority,
                   TRY_CAST(NULLIF(lastmod, '') AS TIMESTAMP) AS warc_ts,
                   'sitemap' AS provider, CAST(3 AS INT) AS discovered_round,
                   CAST(0 AS INT) AS retries
            FROM parsed WHERE kind = 'url'
            ORDER BY url
        """.replace("{base}", _SITEMAP_ORACLE_BASE),
    }
