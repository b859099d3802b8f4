"""Canonicalization: Spark expression ≡ Python mirror; xxhash64_py ≡ Spark."""

import pytest

from pyspark.sql import functions as F

from crawlspark.canonical import canonicalize_expr, canonicalize_py, host_py, xxhash64_py
from crawlspark import synth

CASES = [
    ("https://host1.example.org/p/1", "https://host1.example.org/p/1"),
    ("HTTPS://HOST1.EXAMPLE.ORG/p/1", "https://host1.example.org/p/1"),
    ("https://host1.example.org:443/p/1", "https://host1.example.org/p/1"),
    ("http://host1.example.org:80/p/1", "http://host1.example.org/p/1"),
    ("http://host1.example.org:8080/p/1", "http://host1.example.org:8080/p/1"),
    ("https://host1.example.org/p/1#frag", "https://host1.example.org/p/1"),
    ("https://host1.example.org/%70/1", "https://host1.example.org/p/1"),
    ("https://host1.example.org/a%2Fb", "https://host1.example.org/a%2Fb"),  # %2F stays
    ("https://host1.example.org/a%2fb", "https://host1.example.org/a%2Fb"),  # hex uppercased
    ("https://host1.example.org", "https://host1.example.org/"),
    ("https://host1.example.org?q=1", "https://host1.example.org/?q=1"),
    ("https://host1.example.org/x/../p/1", "https://host1.example.org/p/1"),
    ("https://host1.example.org/./p/1", "https://host1.example.org/p/1"),
    ("https://host1.example.org/a/b/../../p/1", "https://host1.example.org/p/1"),
    ("https://host1.example.org/..", "https://host1.example.org/"),
    ("https://host1.example.org/p/1?a=%7E&b=2#f", "https://host1.example.org/p/1?a=~&b=2"),
    ("  https://host1.example.org/p/1 ", "https://host1.example.org/p/1"),
    ("not-a-url", "not-a-url"),
    # non-ASCII / invalid-UTF-8 escapes: kept verbatim (hex uppercased), never
    # decoded — Spark 4's decode() would throw MALFORMED_CHARACTER_CODING
    ("https://host1.example.org/caf%c3%a9", "https://host1.example.org/caf%C3%A9"),
    ("https://host1.example.org/x%ff", "https://host1.example.org/x%FF"),
    ("https://host1.example.org/%41%5a%61%7a", "https://host1.example.org/AZaz"),
    ("https://host1.example.org/%2d%2e%5f%7e", "https://host1.example.org/-._~"),
    ("https://host1.example.org/%2c%40", "https://host1.example.org/%2C%40"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_py(raw, expected):
    assert canonicalize_py(raw) == expected


def test_spark_matches_python(spark):
    urls = [c[0] for c in CASES]
    # plus the synthetic frontier variants
    urls += [r["url"] for r in synth.frontier_rows(200, 7)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["c"] for r in df.select(canonicalize_expr(F.col("url")).alias("c")).collect()]
    want = [canonicalize_py(u) for u in urls]
    assert got == want


def test_xxhash64_matches_spark(spark):
    urls = [canonicalize_py(c[0]) for c in CASES] + ["", "a", "x" * 100]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["h"] for r in df.select(F.xxhash64(F.col("url")).alias("h")).collect()]
    want = [xxhash64_py(u) for u in urls]
    assert got == want


def test_host_py():
    assert host_py("https://host1.example.org/p/1") == "host1.example.org"
    assert host_py("http://h:8080/p") == "h:8080"


def test_url_trap_signals_edges(spark):
    """Depth/repeat/param extraction over awkward URL shapes: bare host,
    trailing slash, no scheme, query-only, repeated segments."""
    from crawlspark.canonical import url_trap_signals

    rows = [
        ("https://h.org", "h"),                     # no path at all
        ("https://h.org/", "h"),                    # root slash only
        ("https://h.org/a/b/a/b/a/x", "h"),         # 'a' and 'b' repeat 3/2
        ("https://h.org/p?x=1&y=2", "h"),           # 2 params
        ("h.org/no/scheme", "h2"),                  # schemeless -> zeros
        ("https://h3.org/a/a/a/a?q=1&r=2&s=3&t=4&u=5", "h3"),
    ]
    df = spark.createDataFrame(rows, ["url", "host"])
    got = {r["host"]: r.asDict() for r in url_trap_signals(
        df, max_depth=8, max_seg_repeat=2, max_params=4, trap_pct=50
    ).collect()}
    h = got["h"]
    # depths: 0 (bare), 0 (root slash -> empty remainder), 6 (a/b/a/b/a/x), 1 (p)
    assert h["n_urls"] == 4 and h["sum_depth"] == 0 + 0 + 6 + 1
    assert h["max_depth"] == 6 and h["max_seg_repeat"] == 3
    assert h["n_trap_urls"] == 1 and not h["trap"]  # 1/4 = 25% < 50%
    assert got["h2"] == {
        "host": "h2", "n_urls": 1, "sum_depth": 0, "max_depth": 0,
        "max_seg_repeat": 0, "n_trap_urls": 0, "trap": False,
    }
    h3 = got["h3"]  # repeat 4 AND 5 params -> trap URL, 1/1 -> host flagged
    assert h3["max_seg_repeat"] == 4 and h3["n_trap_urls"] == 1 and h3["trap"]


def test_extract_anchor_pairs_resolution_and_edges(spark):
    """href/anchor pair extraction: absolute + root-relative resolve,
    mailto/javascript/fragment-only drop, nested-tag anchors drop, anchor
    whitespace collapses, uppercase scheme-host canonicalizes."""
    from crawlspark.canonical import extract_anchor_pairs_expr

    html = (
        '<a href="https://A.Example.org:443/x/../y">  Go \n here </a>'
        '<a class="z" href="/p/1">rel</a>'
        '<a href="mailto:a@b">m</a>'
        '<a href="#frag">f</a>'
        '<a href="https://ok.org/q"><b>nested</b></a>'
        '<a href="https://ok.org/plain">plain</a>'
    )
    df = spark.createDataFrame(
        [(html, "https://Host.example.org/base")], ["payload", "url"]
    )
    got = df.select(
        extract_anchor_pairs_expr(F.col("payload"), F.col("url")).alias("p")
    ).collect()[0]["p"]
    pairs = [(r["url"], r["anchor"]) for r in got]
    assert pairs == [
        ("https://a.example.org/y", "Go here"),
        ("https://host.example.org/p/1", "rel"),
        ("https://ok.org/plain", "plain"),
    ]


def test_anchor_text_index_top_anchor_tiebreak(spark):
    """Equal-count anchors break by anchor ASC deterministically; inlink
    and distinct-source-host counts aggregate across pages."""
    from crawlspark.canonical import anchor_text_index

    t = "https://t.org/x"
    mk = lambda a: f'<a href="{t}">{a}</a>'  # noqa: E731
    rows = [
        (mk("bbb"), "https://h1.org/p1"),
        (mk("aaa"), "https://h1.org/p2"),
        (mk("aaa") + mk("bbb"), "https://h2.org/p3"),
    ]
    df = spark.createDataFrame(rows, ["payload", "url"])
    out = anchor_text_index(df).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r == {
        "url": t, "n_inlinks": 4, "n_source_hosts": 2,
        "top_anchor": "aaa", "top_anchor_count": 2,
    }
