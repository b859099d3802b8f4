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
