"""sitemap.xml ingestion: raw fetched sitemap bodies → frontier candidates.

The reference crawler's discovery is a curated source list
(``ref:src/settings.rs`` sources + ``ref:src/main.rs:154-267`` per-provider
iteration) — it has no sitemap handling. The north_rule's URL-frontier needs
both public discovery channels of a real web crawl: robots.txt (the DENY
edge, ``crawlspark.robots``) and sitemaps (the SUPPLY edge, this module).
The parser implements the public sitemaps.org 0.9 protocol subset a frontier
consumes:

* ``<urlset>`` documents: one row per ``<url>`` entry with ``<loc>``
  (required; entries without it are dropped), ``<lastmod>``,
  ``<changefreq>`` and ``<priority>`` (optional);
* ``<sitemapindex>`` documents: one row per ``<sitemap>`` entry (``kind =
  'sitemap'``) whose ``loc`` is a CHILD sitemap to fetch next round — the
  recursive walk is the caller's loop, exactly like robots fetches ride the
  normal fetch join;
* both entry kinds may carry attributes and arbitrary whitespace around
  values; unknown child elements are ignored.

Scale shape: pure Catalyst projection — two ``regexp_extract_all`` passes
per body (url blocks + sitemap blocks) and per-block field extraction inside
one higher-order ``transform``, then a single ``posexplode`` to rows. No
Python, no shuffle: a 10^10-URL crawl parses sitemaps for ~10^7 hosts as a
flat map of the sitemap-fetch join output, partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s): values may span lines. Lazy bodies keep one block per entry.
_URL_BLOCK = r"(?s)<url[\s>].*?</url>"
_SMAP_BLOCK = r"(?s)<sitemap[\s>].*?</sitemap>"
_LOC = r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ = r"(?s)<changefreq[^>]*>\s*(.*?)\s*</changefreq>"
_PRIORITY = r"(?s)<priority[^>]*>\s*(.*?)\s*</priority>"


def _entries(body, block_pattern: str, kind: str):
    return F.transform(
        F.regexp_extract_all(body, F.lit(block_pattern), F.lit(0)),
        lambda b: F.struct(
            F.lit(kind).alias("kind"),
            F.regexp_extract(b, _LOC, 1).alias("loc"),
            F.regexp_extract(b, _LASTMOD, 1).alias("lastmod"),
            F.regexp_extract(b, _CHANGEFREQ, 1).alias("changefreq"),
            F.regexp_extract(b, _PRIORITY, 1).try_cast("double").alias("priority"),
        ),
    )


def parse_sitemap(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) → one row per sitemap entry:
    (host, kind, loc, lastmod, changefreq, priority).

    ``kind`` is ``'url'`` (urlset entry — a page to crawl) or ``'sitemap'``
    (sitemapindex entry — a child sitemap to fetch). ``lastmod`` /
    ``changefreq`` come back as raw strings ('' when absent — downstream
    adapters parse them); ``priority`` is try-cast to double (NULL when
    absent or unparseable). Entries with no ``<loc>`` are dropped — a
    sitemap row without a URL supplies nothing."""
    body = F.col(body_col)
    entries = F.concat(
        _entries(body, _URL_BLOCK, "url"), _entries(body, _SMAP_BLOCK, "sitemap")
    )
    return (
        df.select(F.col(host_col).alias("host"), F.explode(entries).alias("e"))
        .filter(F.col("e.loc") != "")
        .select(
            "host",
            F.col("e.kind").alias("kind"),
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
            F.col("e.changefreq").alias("changefreq"),
            F.col("e.priority").alias("priority"),
        )
    )


def sitemap_frontier(
    parsed: DataFrame, discovered_round: int, default_priority: float = 0.5
) -> DataFrame:
    """Adapt parsed ``kind='url'`` entries to ``schemas.FRONTIER`` rows.

    Sitemap priority (0.0-1.0, higher = more important; protocol default
    0.5) maps to the scheduler's ascending integer priority as
    ``round((1 - p) * 10)`` → 0 (p=1.0, first) … 10 (p=0.0, last), so the
    politeness top-k naturally prefers high-priority sitemap entries.
    ``lastmod`` becomes ``warc_ts`` via try_to_timestamp (W3C datetime is a
    timestamp subset; unparseable → NULL). Host stays NULL — the scheduler's
    ``enrich`` derives the canonical host exactly as it does for outlink
    discoveries."""
    # clamp to the protocol's [0.0, 1.0]: a malformed '<priority>9.9</...' must
    # not map to a negative scheduler priority that outranks every seed
    p = F.greatest(
        F.lit(0.0),
        F.least(F.lit(1.0), F.coalesce(F.col("priority"), F.lit(default_priority))),
    )
    return parsed.filter(F.col("kind") == "url").select(
        F.col("loc").alias("url"),
        F.lit(None).cast("string").alias("host"),
        F.round((F.lit(1.0) - p) * 10).cast("int").alias("priority"),
        F.try_to_timestamp(F.nullif(F.col("lastmod"), F.lit(""))).alias("warc_ts"),
        F.lit("sitemap").alias("provider"),
        F.lit(discovered_round).cast("int").alias("discovered_round"),
        F.lit(0).cast("int").alias("retries"),
    )


def sitemap_children(parsed: DataFrame) -> DataFrame:
    """``kind='sitemap'`` locs — the child sitemaps the caller fetches on the
    next round (recursive sitemapindex walk, one level per round like any
    frontier growth)."""
    return parsed.filter(F.col("kind") == "sitemap").select("host", "loc")
