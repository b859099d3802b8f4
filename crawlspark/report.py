"""Crawl-log digest — the engine analog of the reference's Slack notifier
(/root/reference/post_to_slack.py:14-27), which folds the crawler log into a
``[SUMMARY]`` line (total lines + how many were routine ``[INFO]``) and
forwards only the non-routine remainder for human eyes.

The engine's equivalent of the log file is the warehouse ``metrics`` table
(one row of counters per round, scheduler S28); the digest renders it to a
text block: one ``[SUMMARY]`` header with crawl-wide totals, one line per
round, and — mirroring the reference's routine/non-routine split — rounds
with failures or retries are pulled out into a trailing ``[ATTENTION]``
section. Pure driver-side work over a rounds-sized table (one row per round;
a 10^10-URL crawl is still only thousands of rounds), so ``.collect()`` here
is metadata-scale by construction.

Transport is out of scope by design: the reference posts to a Slack webhook
(an external service; SURVEY §2.2 documents transports as N/A) — the digest
is returned as a string and logged, for whatever notifier wraps the engine.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

from . import schemas
from .warehouse import Warehouse

_COUNTERS = ("fetched", "deduped", "robots_blocked", "retried", "failed",
             "datasets", "units")


def metrics_digest(spark: SparkSession, warehouse: Warehouse) -> str:
    """Render the warehouse metrics table into the reference-style digest."""
    rows = sorted(
        warehouse.read_appends(spark, "metrics", schemas.METRICS).collect(),
        key=lambda r: r["round"],
    )
    totals = {c: sum(r[c] for r in rows) for c in _COUNTERS}
    lines = [
        "[SUMMARY] Crawl contains {} round(s): {} fetched, {} deduped, "
        "{} robots-blocked, {} retried, {} failed; {} datasets / {} units "
        "extracted.".format(
            len(rows), totals["fetched"], totals["deduped"],
            totals["robots_blocked"], totals["retried"], totals["failed"],
            totals["datasets"], totals["units"],
        )
    ]
    attention = []
    for r in rows:
        lines.append(
            "[INFO] round {}: fetched={} deduped={} robots_blocked={} "
            "retried={} failed={} datasets={} units={}".format(
                r["round"], r["fetched"], r["deduped"], r["robots_blocked"],
                r["retried"], r["failed"], r["datasets"], r["units"],
            )
        )
        if r["failed"] or r["retried"]:
            attention.append(
                "[ATTENTION] round {}: {} failed, {} retried".format(
                    r["round"], r["failed"], r["retried"]
                )
            )
    digest = "\n".join(lines + attention)
    logging.getLogger(__name__).info("%s", digest)
    return digest
