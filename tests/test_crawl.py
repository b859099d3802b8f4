"""Crawl-equivalence + resume tests (SURVEY.md §5d/e).

The engine's round loop must reproduce the pure-Python sequential oracle
exactly: crawl order, final seen set with dense surrogate keys, per-round
counters. Then: killing after round k and resuming must produce a
byte-identical final state (reference analog: the resumable storage-dir
side-cache + atomic publish, src/main.rs:262-266, database_sink.rs:258-284).
"""

import pytest

from pyspark.sql import functions as F

from crawlspark import schemas, synth
from crawlspark.scheduler import Crawler
from crawlspark.settings import Settings
from crawlspark.warehouse import Warehouse

from oracle_sim import simulate

N_PAGES = 120
N_HOSTS = 7


@pytest.fixture(scope="module")
def synth_dfs(spark):
    pages = spark.createDataFrame(
        [synth.page_row(i, N_HOSTS) for i in range(N_PAGES)], schemas.PAGES
    )
    frontier = spark.createDataFrame(synth.frontier_rows(N_PAGES, N_HOSTS), schemas.FRONTIER)
    robots = spark.createDataFrame(synth.robots_rows(N_HOSTS), schemas.ROBOTS)
    cache = synth.cache_rows(N_PAGES, N_HOSTS)
    cache_df = spark.createDataFrame(cache, schemas.PAGES) if cache else None
    return pages, frontier, robots, cache_df


def oracle(settings: Settings):
    page_urls = {synth.page_url(i, N_HOSTS) for i in range(N_PAGES)}
    cache_urls = {r["url"] for r in synth.cache_rows(N_PAGES, N_HOSTS)}
    robots = {r["host"]: r for r in synth.robots_rows(N_HOSTS)}
    return simulate(
        synth.frontier_rows(N_PAGES, N_HOSTS),
        page_urls,
        robots,
        cache_urls,
        default_budget=settings.crawl.default_host_budget,
        max_retries=settings.crawl.max_retries,
    )


def run_crawler(spark, synth_dfs, wh_dir, max_rounds=None, overrides=None):
    pages, frontier, robots, cache_df = synth_dfs
    settings = Settings.new(overrides=overrides)
    wh = Warehouse(wh_dir)
    crawler = Crawler(
        spark, settings, wh, synth.golden_fields(), pages, robots, frontier, cache_df
    )
    results = crawler.run(max_rounds=max_rounds)
    return settings, wh, results


def collect_state(spark, wh: Warehouse):
    log = [
        (r["round"], r["seq"], r["url"])
        for r in wh.read_appends(spark, "crawl_log").orderBy("round", "seq").collect()
    ]
    seen = {
        r["url"]: r["surrogate_key"]
        for r in wh.read_state(spark, "seen", schemas.SEEN).collect()
    }
    metrics = {
        r["round"]: r.asDict()
        for r in wh.read_appends(spark, "metrics", schemas.METRICS).collect()
    }
    return log, seen, metrics


@pytest.fixture(scope="module")
def full_run(spark, synth_dfs, tmp_path_factory):
    wh_dir = tmp_path_factory.mktemp("wh_full")
    settings, wh, results = run_crawler(spark, synth_dfs, wh_dir)
    return settings, wh, results


def test_crawl_matches_oracle(spark, full_run):
    settings, wh, _ = full_run
    sim = oracle(settings)
    log, seen, metrics = collect_state(spark, wh)

    # exact crawl order equality (BASELINE.json:2)
    assert log == sim.crawl_order
    # exact seen set + dense first-seen surrogate keys
    assert seen == sim.seen
    # per-round counters
    assert len(metrics) == len(sim.metrics)
    for m in sim.metrics:
        got = metrics[m["round"]]
        for k in ("fetched", "deduped", "robots_blocked", "retried", "failed", "new_urls"):
            assert got[k] == m[k], (m["round"], k, got[k], m[k])


def test_extraction_outputs_keyed_and_byte_identical(spark, full_run):
    _, wh, _ = full_run
    units = wh.read_appends(spark, "units")
    datasets = wh.read_appends(spark, "datasets")
    assert datasets.filter(F.col("surrogate_key").isNull()).count() == 0
    assert units.filter(F.col("surrogate_key").isNull()).count() == 0

    from crawlspark.csvsink import render_unit_rows_expr

    # byte-identical text: re-render units from the committed table (the
    # vertical split dropped dataset-level columns — they render as NULLs)
    ex = units.withColumn("kind", F.lit("unit"))
    for fs in synth.golden_fields():
        if fs.global_field:
            ex = ex.withColumn(fs.hash, F.lit(None).cast("string"))
    got = {
        r["url"]: r["text"]
        for r in render_unit_rows_expr(ex, synth.golden_fields()).collect()
    }
    assert got
    for url in got:
        i = int(url.rsplit("/", 1)[1])
        assert got[url] == synth.expected_text(i), url


def test_listing_view(spark, full_run):
    from crawlspark.listing import dataset_listing

    _, wh, _ = full_run
    f = synth.golden_fields()
    listing = dataset_listing(
        wh.read_appends(spark, "datasets"), wh.read_appends(spark, "units"), f
    )
    rows = listing.collect()
    assert len(rows) > 0
    assert {r["isGeoReferenced"] for r in rows} <= {True, False}
    assert [r for r in rows if r["isGeoReferenced"]]
    # links: even pages carry an extracted URI, odd pages the proposal
    assert any(r["link"].startswith("https://landing") for r in rows)


def test_crawl_routed_bloom_matches_oracle(spark, synth_dfs, tmp_path):
    """Scale-path probe (bucket-routed cogroup, no driver collect / whole-
    filter broadcast) produces the exact same crawl as the broadcast probe."""
    settings, wh, _ = run_crawler(
        spark, synth_dfs, tmp_path / "whR",
        overrides={"crawl": {"bloom_probe": "routed"}},
    )
    sim = oracle(settings)
    log, seen, _ = collect_state(spark, wh)
    assert log == sim.crawl_order
    assert seen == sim.seen


def test_kill_and_resume_exact(spark, synth_dfs, full_run, tmp_path):
    _, wh_full, _ = full_run
    # killed after 1 round, then resumed (fresh Crawler instance, same warehouse)
    _, wh_part, res1 = run_crawler(spark, synth_dfs, tmp_path / "whB", max_rounds=1)
    assert len(res1) == 1
    _, wh_part, _ = run_crawler(spark, synth_dfs, tmp_path / "whB")

    a = collect_state(spark, wh_full)
    b = collect_state(spark, wh_part)
    assert a[0] == b[0]  # crawl order
    assert a[1] == b[1]  # seen set + keys
    assert a[2] == b[2]  # metrics
    ua = sorted(map(tuple, wh_full.read_appends(spark, "units").collect()))
    ub = sorted(map(tuple, wh_part.read_appends(spark, "units").collect()))
    assert ua == ub


def test_idempotent_recommit(spark, synth_dfs, tmp_path):
    _, wh, _ = run_crawler(spark, synth_dfs, tmp_path / "whC", max_rounds=1)
    pages, frontier, robots, cache_df = synth_dfs
    assert wh.commit_round(0, snapshots={"frontier": frontier.limit(0)}) is False


def test_crawl_cuckoo_matches_oracle(spark, synth_dfs, tmp_path):
    """seen_filter='cuckoo' produces the exact same crawl as the bloom path
    (filter kind is a routing detail; the exact join decides membership)."""
    settings, wh, _ = run_crawler(
        spark, synth_dfs, tmp_path / "whK",
        overrides={"crawl": {"seen_filter": "cuckoo"}},
    )
    sim = oracle(settings)
    log, seen, _ = collect_state(spark, wh)
    assert log == sim.crawl_order
    assert seen == sim.seen
    assert wh.has_table("cuckoo") and not wh.has_table("bloom")


@pytest.mark.parametrize("overrides", [
    {"crawl": {"seen_filter": "cuckoo"}},
    {"crawl": {"seen_filter": "cuckoo", "bloom_probe": "routed"}},
    {"crawl": {}},  # bloom rebuild path
])
def test_evict_recrawl(spark, synth_dfs, tmp_path, overrides):
    """Full re-crawl eviction loop: crawl → evict 3 urls (seen shrinks, they
    re-enter the frontier) → run() fetches exactly those urls again with
    fresh surrogate keys."""
    settings, wh, _ = run_crawler(spark, synth_dfs, tmp_path / "whE", overrides=overrides)
    _, seen_before, _ = collect_state(spark, wh)
    victims = sorted(seen_before)[:3]
    pages, frontier, robots, cache_df = synth_dfs
    crawler = Crawler(
        spark, settings, wh, synth.golden_fields(), pages, robots, frontier, cache_df
    )
    ev = spark.createDataFrame([(u,) for u in victims], ["url"])
    n = crawler.evict(ev)
    assert n == 3
    seen_mid = {
        r["url"] for r in wh.read_state(spark, "seen", schemas.SEEN).collect()
    }
    assert seen_mid == set(seen_before) - set(victims)
    # evicting urls that are not in the seen set is a no-op (and must NOT
    # delete colliding fingerprints / commit a round)
    last = wh.last_round()
    assert crawler.evict(spark.createDataFrame([("http://nowhere.example/x",)], ["url"])) == 0
    assert wh.last_round() == last
    # the re-crawl: only the evicted urls are eligible again
    results = crawler.run()
    assert sum(r.fetched for r in results) == 3
    _, seen_after, _ = collect_state(spark, wh)
    assert set(seen_after) == set(seen_before)
    # fresh keys continue from the current max (first-seen-wins is per-life)
    max_kept = max(v for u, v in seen_before.items() if u not in victims)
    assert all(seen_after[u] > max_kept for u in victims)


def test_discovery_crawl_follows_links(spark, tmp_path):
    """Opt-in frontier growth: seed ONE url; each fetched page links to the
    next (and the last links BACK to the first — the cycle must terminate
    via the seen set). The crawl follows the chain across rounds."""
    import datetime

    urls = [f"https://site.example/p/{i}" for i in range(4)]
    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [
            (u, ts, bytearray(f'<a href="{urls[(i + 1) % len(urls)]}">next</a>'.encode()),
             None, None)
            for i, u in enumerate(urls)
        ],
        schemas.PAGES,
    )
    frontier = spark.createDataFrame(
        [(urls[0], "site.example", 0, ts, "seed", 0, 0)], schemas.FRONTIER
    )
    robots = spark.createDataFrame([], schemas.ROBOTS)
    settings = Settings.new(
        overrides={"crawl": {"discover_links": True, "max_retries": 0}}
    )
    wh = Warehouse(tmp_path / "whD")
    results = Crawler(
        spark, settings, wh, synth.golden_fields(), pages, robots, frontier
    ).run()
    assert sum(r.fetched for r in results) == len(urls)      # whole chain crawled
    assert results[-1].frontier_left == 0                    # cycle terminated
    log, seen, _ = collect_state(spark, wh)
    assert set(seen) == set(urls)
    # one url per round, in chain order (each link discovered the next round)
    assert [u for _, _, u in log] == urls


def test_trap_detect_derates_flagged_host_budget(spark, tmp_path):
    """crawl.trap_detect: a host whose candidate URLs look like traps
    (repeated segments) gets its politeness budget divided; the clean host
    keeps the full budget; with the knob OFF both hosts fetch alike."""
    from crawlspark import schemas, synth
    from crawlspark.scheduler import Crawler
    from crawlspark.settings import Settings
    from crawlspark.warehouse import Warehouse

    trap_h, clean_h = "traphost.example.org", "cleanhost.example.org"

    def mk_rows(host, shape):
        pages, frontier = [], []
        for i in range(8):
            url = f"https://{host}{shape(i)}"
            pr = synth.page_row(i, 2)
            pr["url"] = url
            pages.append(pr)
            frontier.append({
                "url": url, "host": host, "priority": 0,
                "warc_ts": synth.warc_ts(i), "provider": "seed",
                "discovered_round": 0, "retries": 0,
            })
        return pages, frontier

    tp, tf = mk_rows(trap_h, lambda i: f"/a/b/a/b/a/b/{i}")
    cp, cf = mk_rows(clean_h, lambda i: f"/p/{i}")
    pages = spark.createDataFrame(tp + cp, schemas.PAGES)
    frontier = spark.createDataFrame(tf + cf, schemas.FRONTIER)
    robots = spark.createDataFrame(
        [{"host": h, "disallow_prefixes": [], "crawl_delay_s": 1.0,
          "max_per_round": 4} for h in (trap_h, clean_h)],
        schemas.ROBOTS,
    )

    def fetched_per_host(settings, wdir):
        wh = Warehouse(str(tmp_path / wdir))
        Crawler(
            spark, settings, wh, synth.golden_fields(), pages, robots,
            frontier, None,
        ).run(max_rounds=1)
        log = wh.read_appends(spark, "crawl_log", schemas.CRAWL_LOG)
        rows = [r for r in log.collect() if r["fetched"]]
        return {
            h: sum(1 for r in rows if r["host"] == h)
            for h in (trap_h, clean_h)
        }

    on = fetched_per_host(
        Settings.new(overrides={"crawl": {"trap_detect": True,
                                          "trap_budget_divisor": 4}}),
        "wh_on",
    )
    assert on == {trap_h: 1, clean_h: 4}   # 4 div 4 = 1 vs full budget

    off = fetched_per_host(Settings.new(), "wh_off")
    assert off == {trap_h: 4, clean_h: 4}  # default path untouched
