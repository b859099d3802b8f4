"""sitemap ingestion + host-rank frontier prioritization."""

from pyspark.sql import functions as F


def test_parse_sitemap_urlset(spark):
    from crawlspark.sitemap import parse_sitemap

    body = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>  https://example.org/a  </loc>
    <lastmod>2024-03-01T12:00:00Z</lastmod>
    <changefreq>weekly</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc>https://example.org/b</loc></url>
  <url><priority>0.1</priority></url>
  <url attr="x"><loc>https://example.org/c</loc></url>
</urlset>"""
    df = spark.createDataFrame([("example.org", body)], ["host", "body"])
    rows = sorted(parse_sitemap(df).collect(), key=lambda r: r["loc"])
    assert [r["loc"] for r in rows] == [
        "https://example.org/a", "https://example.org/b", "https://example.org/c"
    ]
    a = rows[0]
    assert a["kind"] == "url"
    assert a["lastmod"] == "2024-03-01T12:00:00Z"
    assert a["changefreq"] == "weekly"
    assert a["priority"] == 0.9
    assert rows[1]["priority"] is None and rows[1]["lastmod"] == ""


def test_parse_sitemap_index_and_frontier(spark):
    from crawlspark.sitemap import parse_sitemap, sitemap_children, sitemap_frontier

    body = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://example.org/s1.xml</loc>"
        "<lastmod>2024-01-01</lastmod></sitemap>"
        "<sitemap><loc>https://example.org/s2.xml</loc></sitemap>"
        "</sitemapindex>"
        '<urlset><url><loc>https://example.org/p</loc>'
        "<lastmod>2024-05-06</lastmod></url></urlset>"
    )
    df = spark.createDataFrame([("example.org", body)], ["host", "body"])
    parsed = parse_sitemap(df)
    kids = sorted(r["loc"] for r in sitemap_children(parsed).collect())
    assert kids == ["https://example.org/s1.xml", "https://example.org/s2.xml"]
    fr = sitemap_frontier(parsed, discovered_round=7).collect()
    assert len(fr) == 1  # sitemapindex rows are NOT frontier URLs
    r = fr[0]
    assert r["url"] == "https://example.org/p"
    assert r["priority"] == 5  # protocol default 0.5
    assert r["warc_ts"].year == 2024 and r["warc_ts"].day == 6
    assert r["provider"] == "sitemap" and r["discovered_round"] == 7
    assert r["retries"] == 0 and r["host"] is None


def test_sitemap_frontier_priority_mapping(spark):
    from crawlspark.sitemap import parse_sitemap, sitemap_frontier

    body = "".join(
        f"<urlset><url><loc>https://e.org/{k}</loc>"
        f"<priority>0.{k}</priority></url></urlset>"
        for k in range(10)
    )
    df = spark.createDataFrame([("e.org", body)], ["host", "body"])
    fr = sitemap_frontier(parse_sitemap(df), discovered_round=0).collect()
    got = {r["url"].rsplit("/", 1)[1]: r["priority"] for r in fr}
    assert got == {str(k): 10 - k for k in range(10)}


def _py_host_rank(edges, iterations=8, damping=85, scale=10**12):
    """Pure-python mirror of the pinned fixed-point recurrence."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    u = scale // n
    base = ((100 - damping) * u) // 100
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {h: u for h in nodes}
    for _ in range(iterations):
        inflow = {h: 0 for h in nodes}
        for s, d in e:
            inflow[d] += rank[s] // deg[s]
        dang = sum(rank[h] for h in nodes if h not in deg)
        rank = {
            h: base + (damping * (inflow[h] + dang // n)) // 100 for h in nodes
        }
    return rank


def test_host_rank_mirror_and_parallelism_invariance(spark):
    from crawlspark.hostrank import host_rank

    edges = [(f"h{i % 13}", f"h{(i * 5 + 2) % 13}") for i in range(60)]
    edges += [("h20", "h0"), ("h21", "h0")]  # h20/h21 never linked-to
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = _py_host_rank(edges, iterations=5)
    got = {r["host"]: r["rank"] for r in host_rank(df, iterations=5).collect()}
    assert got == want
    # the integer recurrence is partition-order independent: a radically
    # different partitioning must give BIT-IDENTICAL ranks
    got1 = {
        r["host"]: r["rank"]
        for r in host_rank(df.repartition(17, "dst"), iterations=5).collect()
    }
    assert got1 == got
    # hub h0 (two extra in-links) outranks an ordinary cycle node
    others = [v for k, v in got.items() if k not in ("h0", "h20", "h21")]
    assert got["h0"] > max(others)


def test_rank_priorities_and_frontier_overlay(spark):
    from crawlspark.hostrank import frontier_with_rank, rank_priorities

    scale = 10**12
    n = 4
    u = scale // n
    ranks = spark.createDataFrame(
        [("big", 5 * u), ("mid", 2 * u), ("avg", u), ("low", u // 3)],
        ["host", "rank"],
    )
    pr = {r["host"]: r["rank_priority"]
          for r in rank_priorities(ranks, scale=scale, levels=4).collect()}
    assert pr == {"big": 0, "mid": 1, "avg": 2, "low": 3}

    frontier = spark.createDataFrame(
        [("u1", "big", 9), ("u2", "low", 9), ("u3", "unknown", 4)],
        ["url", "host", "priority"],
    )
    out = {
        r["url"]: r["priority"]
        for r in frontier_with_rank(
            frontier, rank_priorities(ranks, scale=scale, levels=4)
        ).collect()
    }
    assert out == {"u1": 0, "u2": 3, "u3": 4}


def test_sitemap_seeded_crawl(spark, tmp_path):
    """End-to-end: sitemap bodies -> sitemap_frontier -> the real crawl
    loop. The frontier rows carry NULL host + provider='sitemap'; the
    scheduler's enrich must canonicalize them exactly like any seed."""
    from crawlspark import schemas, synth
    from crawlspark.scheduler import Crawler
    from crawlspark.settings import Settings
    from crawlspark.sitemap import parse_sitemap, sitemap_frontier
    from crawlspark.warehouse import Warehouse

    n_pages, n_hosts = 24, 3
    pages = spark.createDataFrame(
        [synth.page_row(i, n_hosts) for i in range(n_pages)], schemas.PAGES
    )
    robots = spark.createDataFrame(synth.robots_rows(n_hosts), schemas.ROBOTS)
    body = "".join(
        f"<urlset><url><loc>{synth.page_url(i, n_hosts)}</loc>"
        f"<priority>0.{i % 10}</priority></url></urlset>"
        for i in range(n_pages)
    )
    bodies = spark.createDataFrame([("any", body)], ["host", "body"])
    frontier = sitemap_frontier(parse_sitemap(bodies), discovered_round=0)
    assert frontier.count() == n_pages

    wh = Warehouse(str(tmp_path / "wh"))
    crawler = Crawler(
        spark, Settings.new(), wh, synth.golden_fields(), pages, robots,
        frontier.select(*schemas.FRONTIER.fieldNames()), None,
    )
    results = crawler.run(max_rounds=6)
    fetched = sum(r.fetched for r in results)
    seen = wh.read_state(spark, "seen", schemas.SEEN)
    # every sitemap URL except robots-blocked ones ends up crawled exactly once
    assert fetched == seen.count() == n_pages
    log = wh.read_appends(spark, "crawl_log", schemas.CRAWL_LOG)
    assert log.filter(F.col("fetched")).count() == n_pages


def test_host_rank_priorities_steer_crawl_order(spark, tmp_path):
    """frontier_with_rank overlays tier-0 priority on a hub host; under a
    per-host politeness budget the overlay must change WHICH of that host's
    URLs win the round-1 budget (priority uniform → warc_ts decides), while
    an unboosted host still selects by its original per-URL priorities.
    Priority is a per-host selection key, never cross-host order: seq ranks
    by (chost, priority, ...) — see scheduler.py ORDER."""
    from crawlspark import schemas, synth
    from crawlspark.hostrank import frontier_with_rank
    from crawlspark.scheduler import Crawler
    from crawlspark.settings import Settings
    from crawlspark.warehouse import Warehouse

    n_pages, n_hosts = 20, 4
    pages = spark.createDataFrame(
        [synth.page_row(i, n_hosts) for i in range(n_pages)], schemas.PAGES
    )
    robots = spark.createDataFrame(
        [
            {
                "host": f"host{h}.example.org",
                "disallow_prefixes": [],
                "crawl_delay_s": 1.0,
                "max_per_round": 2,
            }
            for h in range(n_hosts)
        ],
        schemas.ROBOTS,
    )
    # priority DESCENDS as warc_ts ascends: the two orders disagree, so the
    # overlay's effect on per-host selection is observable
    host1 = [1, 9, 13, 17]  # host_of(i,4)==1
    host2 = [2, 6, 14, 18]  # host_of(i,4)==2
    frontier = spark.createDataFrame(
        [
            {
                "url": synth.page_url(i, n_hosts),
                "host": f"host{synth.host_of(i, n_hosts)}.example.org",
                "priority": 3 - rank,
                "warc_ts": synth.warc_ts(i),
                "provider": "seed",
                "discovered_round": 0,
                "retries": 0,
            }
            for ids in (host1, host2)
            for rank, i in enumerate(ids)
        ],
        schemas.FRONTIER,
    )
    boosted = "host2.example.org"
    prios = spark.createDataFrame([(boosted, 0)], ["host", "rank_priority"])
    fr2 = frontier_with_rank(frontier, prios).select(*schemas.FRONTIER.fieldNames())
    # overlay: boosted host all priority 0, others untouched
    got = fr2.filter(F.col("host") == boosted).select("priority").distinct().collect()
    assert [r["priority"] for r in got] == [0]

    wh = Warehouse(str(tmp_path / "wh2"))
    crawler = Crawler(
        spark, Settings.new(), wh, synth.golden_fields(), pages, robots, fr2, None
    )
    crawler.run(max_rounds=1)
    log = wh.read_appends(spark, "crawl_log", schemas.CRAWL_LOG)
    fetched = {
        h: {r["url"] for r in rows_}
        for h, rows_ in (
            (h, [r for r in log.collect() if r["fetched"] and r["host"] == h])
            for h in ("host1.example.org", boosted)
        )
    }
    # unboosted host1: budget 2 picks its lowest-priority-value URLs (17, 13)
    assert fetched["host1.example.org"] == {
        synth.page_url(17, n_hosts), synth.page_url(13, n_hosts)
    }
    # boosted host2: priorities flattened to 0 → warc_ts picks the EARLIEST
    # URLs (2, 6) — exactly the rows the original priorities would have lost
    assert fetched[boosted] == {
        synth.page_url(2, n_hosts), synth.page_url(6, n_hosts)
    }


def test_freshness_driven_recrawl_loop(spark, tmp_path):
    """freshness tiers -> Crawler.evict -> re-fetch: URLs whose observation
    history shows fingerprint churn land in tier 0, get evicted from the
    seen set (re-queued), and the next run() re-fetches EXACTLY them."""
    from crawlspark import schemas, synth
    from crawlspark.freshness import change_rates, recrawl_priorities
    from crawlspark.scheduler import Crawler
    from crawlspark.settings import Settings
    from crawlspark.warehouse import Warehouse

    n_pages, n_hosts = 12, 3
    pages = spark.createDataFrame(
        [synth.page_row(i, n_hosts) for i in range(n_pages)], schemas.PAGES
    )
    robots = spark.createDataFrame(
        [{"host": f"host{h}.example.org", "disallow_prefixes": [],
          "crawl_delay_s": 1.0, "max_per_round": 8} for h in range(n_hosts)],
        schemas.ROBOTS,
    )
    urls = [synth.page_url(i, n_hosts) for i in range(n_pages)]
    frontier = spark.createDataFrame(
        [{"url": u, "host": f"host{synth.host_of(i, n_hosts)}.example.org",
          "priority": 0, "warc_ts": synth.warc_ts(i), "provider": "seed",
          "discovered_round": 0, "retries": 0} for i, u in enumerate(urls)],
        schemas.FRONTIER,
    )
    wh = Warehouse(str(tmp_path / "wh"))
    crawler = Crawler(
        spark, Settings.new(), wh, synth.golden_fields(), pages, robots,
        frontier, None,
    )
    r1 = crawler.run()
    assert sum(r.fetched for r in r1) == n_pages

    # observation history: even doc ids changed between observations (hot)
    hot = {urls[i] for i in range(n_pages) if i % 2 == 0}
    hist = spark.createDataFrame(
        [(u, 0, "a") for u in urls]
        + [(u, 1, "b" if u in hot else "a") for u in urls],
        ["url", "round", "fingerprint"],
    )
    rates = change_rates(hist)
    tier0 = recrawl_priorities(rates).filter(
        F.col("recrawl_priority") == 0
    ).select("url")
    assert crawler.evict(tier0) == len(hot)

    r2 = crawler.run()
    assert sum(r.fetched for r in r2) == len(hot)
    log = wh.read_appends(spark, "crawl_log", schemas.CRAWL_LOG)
    refetched = {
        r["url"] for r in log.collect()
        if r["fetched"] and r["round"] >= len(r1)
    }
    assert refetched == hot


def test_host_graph_from_pages_composes_with_rank(spark):
    """pages -> host graph -> host_rank -> rank_priorities -> overlay: the
    discovery loop closes on crawl output. A hub host linked by all others
    must earn the best tier."""
    from crawlspark.hostrank import (
        frontier_with_rank, host_graph_from_pages, host_rank, rank_priorities,
    )

    def page(host, links):
        html = "".join(f'<a href="https://{t}/x">t</a>' for t in links)
        return (html, f"https://{host}/p")

    hub = "hub.org"
    spokes = [f"s{i}.org" for i in range(6)]
    rows = [page(s, [hub, "dead-end.org"]) for s in spokes]
    rows.append(page(hub, [spokes[0], spokes[0]]))  # dup edge collapses
    rows.append(page(hub, [hub]))                   # self edge drops
    pages = spark.createDataFrame(rows, ["payload", "url"])
    g = host_graph_from_pages(pages)
    edges = {(r["src"], r["dst"]) for r in g.collect()}
    assert (hub, spokes[0]) in edges and (hub, hub) not in edges
    assert g.count() == len(edges)  # distinct collapsed the dup
    assert edges == {(s, hub) for s in spokes} | {
        (s, "dead-end.org") for s in spokes
    } | {(hub, spokes[0])}

    prios = rank_priorities(host_rank(g, iterations=5))
    tiers = {r["host"]: r["rank_priority"] for r in prios.collect()}
    assert tiers[hub] == min(tiers.values())  # the hub earns the best tier
    fr = spark.createDataFrame(
        [("https://hub.org/new", hub, 9)], ["url", "host", "priority"]
    )
    got = frontier_with_rank(fr, prios).collect()[0]
    assert got["priority"] == tiers[hub]


def test_sitemap_priority_clamped(spark):
    """Malformed priorities outside [0,1] clamp to the protocol range — a
    hostile sitemap cannot mint a priority that outranks every seed."""
    from crawlspark.sitemap import parse_sitemap, sitemap_frontier

    body = ("<urlset><url><loc>https://e.org/a</loc>"
            "<priority>9.9</priority></url>"
            "<url><loc>https://e.org/b</loc>"
            "<priority>-5</priority></url></urlset>")
    df = spark.createDataFrame([("e.org", body)], ["host", "body"])
    got = {r["url"][-1]: r["priority"]
           for r in sitemap_frontier(parse_sitemap(df), 0).collect()}
    assert got == {"a": 0, "b": 10}


def test_host_rank_empty_graph(spark):
    """Single-host batches produce an empty edge frame — empty ranks and
    tiers, never a ZeroDivisionError."""
    from crawlspark.hostrank import host_graph_from_pages, host_rank, rank_priorities

    pages = spark.createDataFrame(
        [('<a href="/self">s</a>', "https://only.org/p")], ["payload", "url"]
    )
    g = host_graph_from_pages(pages)
    ranks = host_rank(g)
    assert ranks.count() == 0
    assert rank_priorities(ranks).count() == 0
