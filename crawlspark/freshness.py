"""Freshness-driven recrawl prioritization from fetch-history fingerprints.

The reference crawls its curated list once per run (``ref:src/main.rs:154-267``
— no revisit policy exists); a continuous web crawl must decide WHICH seen
URLs to refetch. The public construction is change-rate estimation from
repeated observations (Cho & Garcia-Molina 2003, "Effective Page Refresh
Policies for Web Crawlers": pages observed to change more often get
refreshed more often). This module derives, from a (url, round, fingerprint)
observation history, per-URL change counts and an integer recrawl tier that
plugs into the existing frontier-priority overlay
(``hostrank.frontier_with_rank`` consumes the same (key, priority) shape) and
the cuckoo seen-filter eviction loop (``Crawler.evict`` re-admits evicted
URLs — eviction candidates = tier-0 rows here).

Everything stays on an integer axis: the Cho-GM Poisson-rate estimator
``r = -ln(1 - X/n)`` is MONOTONE in X/n for fixed n, so tiering by integer
cross-multiplied change ratios (``changes * K >= intervals * k``) yields the
same priority ORDER without transcendental floats — which is also what lets
a DuckDB oracle reproduce the output bit-for-bit at any parallelism.

Scale shape: one keyed shuffle on url; the per-url window is bounded by the
number of crawl ROUNDS a URL was observed in (tens, never data-scale), so no
partition ever holds more than that; the aggregation is map-side combinable.
At 10^10 URLs this is a routine pass over the fetch-history fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rates(
    history: DataFrame,
    url_col: str = "url",
    round_col: str = "round",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """(url, round, fingerprint) observations → per-url change statistics.

    ``intervals`` counts consecutive observation pairs; ``changes`` counts
    pairs whose fingerprints differ. Rows: (url, observations, intervals,
    changes, last_round). Duplicate (url, round) observations are collapsed
    to one (deterministically: min fingerprint wins) so re-fetch retries
    cannot double-count an interval.
    """
    obs = (
        history.groupBy(url_col, round_col)
        .agg(F.min(fp_col).alias("fp"))
        .select(
            F.col(url_col).alias("url"),
            F.col(round_col).alias("round"),
            "fp",
        )
    )
    w = Window.partitionBy("url").orderBy("round")
    prev = F.lag("fp").over(w)
    marked = obs.select(
        "url",
        "round",
        prev.isNotNull().cast("long").alias("has_prev"),
        (prev.isNotNull() & (F.col("fp") != prev)).cast("long").alias("changed"),
    )
    return marked.groupBy("url").agg(
        F.count(F.lit(1)).alias("observations"),
        F.sum("has_prev").alias("intervals"),
        F.sum("changed").alias("changes"),
        F.max("round").alias("last_round"),
    )


def recrawl_priorities(
    rates: DataFrame,
    hot_pct: int = 50,
    warm_pct: int = 10,
) -> DataFrame:
    """Change statistics → (url, recrawl_priority) tiers for the frontier
    overlay: 0 = hot (changed on ≥ ``hot_pct``% of intervals), 1 = warm
    (≥ ``warm_pct``%), 2 = unknown (never re-observed — explore), 3 = cold.
    Integer cross-multiply only; ascending priority = the scheduler's
    ordering convention (lower value fetched first within a host).
    """
    return rates.select(
        "url",
        F.when(F.col("intervals") == 0, F.lit(2))
        .when(F.col("changes") * 100 >= F.col("intervals") * hot_pct, F.lit(0))
        .when(F.col("changes") * 100 >= F.col("intervals") * warm_pct, F.lit(1))
        .otherwise(F.lit(3))
        .cast("int")
        .alias("recrawl_priority"),
    )
