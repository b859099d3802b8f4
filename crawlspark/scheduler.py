"""The crawl round loop — the engine's scheduler.

Reference semantics re-expressed as batch fetch rounds (north_rule):

* the reference crawls the seed list strictly sequentially, one dataset at a
  time (/root/reference/src/main.rs:154-267) — "politeness by construction";
  the engine makes politeness explicit: per-host budget-k selection per round.
* fetch failure → recovery copy → else skip (/root/reference/src/main.rs:182-203)
  becomes: pages join → cache join → bounded retry re-enqueue → failed.
* dedup by first-seen id (/root/reference/src/storage/surrogate_key.rs:24-34)
  becomes the canonical-URL seen set (seen.py) with dense first-seen keys.
* per-item error tolerance + counters (/root/reference/src/main.rs:224-266,
  post_to_slack.py:14-27) become the metrics + lineage tables.
* temp→final atomic publish (/root/reference/src/storage/database_sink.rs:258-284)
  becomes the per-round warehouse snapshot commit (warehouse.py) — which also
  gives exact resume.

Deterministic round semantics (the contract shared with tests/oracle_sim.py —
every rule below is implemented twice and asserted equal):

  round r over frontier rows (url, host, priority, warc_ts, provider, retries):
    1. canonicalize url → curl, url_hash = xxhash64(curl), chost, path
    2. robots: any disallow prefix of path ⇒ 'blocked' (dropped permanently)
    3. curl in seen ⇒ 'dup_seen'; later duplicate within batch ⇒ 'dup_batch'
       (first = min by (priority, warc_ts, url)); both dropped permanently
    4. politeness: per chost order by (priority, warc_ts, curl, url), keep
       max_per_round (robots, default settings.crawl.default_host_budget);
       rest ⇒ deferred (stays in frontier)
    5. crawl order = (chost, priority, warc_ts, curl) over the selected set →
       seq 1..k (global within round); chost compared as a string
    6. fetch: pages hit ⇒ fetched; else cache hit ⇒ fetched (recovered);
       else retries < max_retries ⇒ retried (re-enqueued, retries+1)
       else failed (dropped)
    7. surrogate keys: dense, continuing from the seen max, over fetched rows
       in crawl order; seen += fetched
    8. metrics: counters per round; crawl_log: (round, seq, curl, fetched)
    9. frontier' = deferred ∪ retried

Scale notes:
* exact per-host top-k is computed in two phases — a salted local top-k per
  (host, pmod(url_hash, S)) cuts each host's candidates to ≤ budget*S rows
  BEFORE the exact per-host window, so the skewed host (~20% of the frontier)
  never passes through one task whole. Both phases are filters on eligible
  rows only, so the result is exactly the unsalted top-k.
* the only driver-side loop is over rounds; everything inside a round is
  DataFrame ops with one mapInPandas (extraction) and one optional vectorized
  Bloom probe. Counters are computed with one aggregate per cached branch.
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

_TIMING = os.environ.get("CRAWLSPARK_TIMING") == "1"


class _Timer:
    def __init__(self, round_: int):
        self.round = round_
        self.t = time.time()

    def lap(self, label: str) -> None:
        if _TIMING:
            now = time.time()
            sys.stderr.write(f"[timing r{self.round}] {label}: {now - self.t:.2f}s\n")
            self.t = now

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import schemas
from .canonical import canonicalize_expr, host_expr, url_hash_expr
from .extract import extract_pages, split_dataset_units
from .fields import AbcdFields
from .seen import (
    PartitionedBloom,
    PartitionedCuckoo,
    distributed_bloom_update,
    distributed_cuckoo_update,
    rank_and_key,
    split_new_vs_seen,
)
from .settings import Settings
from .warehouse import Warehouse

ORDER = ["priority", "warc_ts", "curl", "url"]  # the canonical tie-break chain
FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]
# frontier *state* carries the canonical columns: canonicalization runs once
# per url at seed/discovery time, not once per round (deferred/retried rows
# keep their computed values through warehouse snapshots)
ENRICHED_COLS = FRONTIER_COLS + ["curl", "url_hash", "chost", "path"]


def enrich(df: DataFrame) -> DataFrame:
    """Add canonical columns to raw frontier/pages rows (idempotent)."""
    if "curl" in df.columns:
        return df
    return (
        df.withColumn("curl", canonicalize_expr(F.col("url")))
        .withColumn("url_hash", url_hash_expr(F.col("curl")))
        .withColumn("chost", host_expr(F.col("curl")))
        .withColumn("path", F.regexp_extract(F.col("curl"), r"^[^:]+://[^/?]*(/[^?]*)", 1))
    )


def build_pages_index(pages: DataFrame) -> DataFrame:
    """Canonical fetchable-pages index, one row per canonical url (first by
    warc_ts, url). Keyed on (url_hash, canonical url) — the hash is the
    shuffle/bucket key, the string disambiguates xxhash64 collisions (expected
    at the 10^10-URL design point by birthday bound). At cluster scale this is
    a bucketed Iceberg table keyed by url_hash (the fetch join is then
    co-located); locally a parquet snapshot with the same layout."""
    p = enrich(pages.select("url", "warc_ts", "html"))
    w = Window.partitionBy("url_hash", "curl").orderBy(
        F.col("warc_ts").asc(), F.col("url").asc()
    )
    return (
        p.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("url_hash", F.col("curl").alias("page_curl"), "html")
    )


@dataclass
class RoundResult:
    round: int
    fetched: int
    deduped: int
    robots_blocked: int
    retried: int
    failed: int
    new_urls: int
    datasets: int
    units: int
    frontier_left: int


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        settings: Settings,
        warehouse: Warehouse,
        fields: AbcdFields,
        pages: DataFrame,
        robots: DataFrame,
        frontier_seed: DataFrame,
        cache: DataFrame | None = None,
        landing_base_url: str = "https://landing.example/landingpage.php",
    ):
        self.spark = spark
        self.settings = settings
        self.wh = warehouse
        self.fields = fields
        self.landing_base_url = landing_base_url

        # the fetch index is materialized once (hash-layout parquet — the
        # local stand-in for a bucketed Iceberg table): every round's plan
        # then starts from a plain scan instead of re-optimizing the
        # canonicalize+window index-build subtree (driver plan-compile time
        # was the dominant *serial* cost per round)
        self.pages_idx = self._materialize_index(pages, "pages_idx")
        self.cache_idx = (
            self._materialize_index(cache, "cache_idx") if cache is not None else None
        )
        self.robots = robots

        # one-time dimension: the (name, hash) translation table
        # (src/storage/database_sink.rs:104-125)
        self.wh.write_once(
            "translation",
            spark.createDataFrame(fields.translation_rows(), ["name", "hash"]),
        )

        self._seed = frontier_seed

    # ------------------------------------------------------------------
    def _materialize_index(self, df: DataFrame, name: str) -> DataFrame:
        """Build the fetch index once as a hash-layout parquet snapshot."""
        n = self.settings.crawl.seen_buckets
        self.wh.write_once(
            name, build_pages_index(df).repartition(n, "url_hash")
        )
        # NOTE: deliberately NOT cached in memory — the deserialized payload
        # blobs are several × the parquet size and evict the round's working
        # caches (measured: commit time 4s → 45s under storage pressure);
        # the parquet scan + hash exchange is cheaper than cache thrash. On a
        # real cluster this is a bucketed Iceberg table and the exchange
        # disappears entirely.
        return self.wh.read_state(self.spark, name)

    # ------------------------------------------------------------------
    @property
    def _filter_table(self) -> str:
        """Warehouse table of the seen-set prefilter ('bloom' or 'cuckoo')."""
        return self.settings.crawl.seen_filter

    def _new_bloom(self) -> "PartitionedBloom | PartitionedCuckoo":
        c = self.settings.crawl
        if c.seen_filter == "cuckoo":
            return PartitionedCuckoo(c.cuckoo_entries, c.cuckoo_slots, c.seen_buckets)
        return PartitionedBloom(c.bloom_bits, c.bloom_hashes, c.seen_buckets)

    def _bloom_probe_mode(self) -> str:
        """'broadcast' (small filter: collect + ship whole) or 'routed'
        (bucket-cogrouped probe; the filter never leaves the executors).
        'auto' switches on the statically-known total filter size — at 10^10
        URLs a useful filter is 10+ GB and MUST take the routed path."""
        c = self.settings.crawl
        if c.bloom_probe != "auto":
            return c.bloom_probe
        if c.seen_filter == "cuckoo":
            total = c.cuckoo_entries * c.cuckoo_slots * 2 * c.seen_buckets
        else:
            total = (c.bloom_bits // 8 + 1) * c.seen_buckets
        return "broadcast" if total <= c.bloom_broadcast_max_bytes else "routed"

    def _bloom_from_warehouse(self):
        """Current prefilter state in the representation the probe mode needs:
        a driver PartitionedBloom/PartitionedCuckoo (broadcast mode) or the
        warehouse DataFrame itself (routed mode — never collected)."""
        tname = self._filter_table
        if self._bloom_probe_mode() == "routed":
            return (
                self.wh.read_state(self.spark, tname)
                if self.wh.has_table(tname)
                else None
            )
        flt = self._new_bloom()
        if self.wh.has_table(tname):
            rows = self.wh.read_state(self.spark, tname).collect()
            if rows and tname == "cuckoo":
                flt = PartitionedCuckoo.from_rows(
                    [(r["bucket"], r["table"], r["m"], r["slots"], r["n_buckets"]) for r in rows]
                )
            elif rows:
                flt = PartitionedBloom.from_rows(
                    [(r["bucket"], r["bitmap"], r["bits"], r["k"], r["n_buckets"]) for r in rows]
                )
        return flt

    def _filter_update(self, new_hashes: DataFrame, prev_df, deletes: DataFrame | None = None):
        """This round's prefilter state from the previous state + adds
        (+ deletes, cuckoo only) — executor-side per-bucket cogroup."""
        c = self.settings.crawl
        if c.seen_filter == "cuckoo":
            return distributed_cuckoo_update(
                new_hashes, prev_df, c.cuckoo_entries, c.cuckoo_slots,
                c.seen_buckets, deleted_hashes=deletes,
            )
        assert deletes is None, "bloom filters cannot delete — use seen_filter='cuckoo'"
        return distributed_bloom_update(
            new_hashes, prev_df, c.bloom_bits, c.bloom_hashes, c.seen_buckets
        )

    def _load_state(self):
        """(frontier, seen, bloom, next_key, next_round) from the last commit."""
        last = self.wh.last_round()
        if last < 0:
            frontier = self._apply_debug_window(self._seed)
            seen = self.spark.createDataFrame([], schemas.SEEN)
            fresh = None if self._bloom_probe_mode() == "routed" else self._new_bloom()
            return frontier, seen, fresh, 1, 0
        frontier = self.wh.read_state(self.spark, "frontier", schemas.FRONTIER)
        seen = self.wh.read_state(self.spark, "seen", schemas.SEEN)
        bloom = self._bloom_from_warehouse()
        mx = seen.agg(F.max("surrogate_key").alias("m")).collect()[0]["m"]
        return frontier, seen, bloom, (mx or 0) + 1, last + 1

    def _apply_debug_window(self, seed: DataFrame) -> DataFrame:
        """The reference's skip/take debug window over the seed list
        (src/main.rs:154-169, src/settings.rs:56-60), deterministic via
        row_number over the canonical seed order."""
        s = self.settings
        if not s.general.debug:
            return seed
        start = s.debug.dataset_start or 0
        limit = s.debug.dataset_limit
        w = Window.orderBy(
            F.col("priority").asc(), F.col("warc_ts").asc(), F.col("url").asc()
        )
        out = seed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > start)
        if limit is not None:
            out = out.filter(F.col("_rn") <= start + limit)
        return out.drop("_rn")

    # ------------------------------------------------------------------
    def evict(self, urls: DataFrame, requeue: bool = True) -> int:
        """Re-crawl eviction: remove URLs from the exact seen set AND the
        prefilter, so a future round fetches them again (the north_star's
        deletable-filter path; a production re-crawl policy calls this with
        the stale slice of the seen table).

        ``urls``: any frame with a ``url`` column (canonicalized here).
        Only URLs actually present in the seen set are deleted from the
        filter — deleting a never-inserted key could clear a colliding key's
        fingerprint (inherent cuckoo-filter caveat; the exact semi-join is
        the guard).

        * ``seen_filter='cuckoo'``: per-bucket fingerprint deletes — ONE
          cogroup over the eviction hashes, no rebuild (this is why the
          cuckoo path exists: at 10^10 URLs a Bloom rebuild re-reads the
          whole seen table per eviction wave).
        * ``seen_filter='bloom'``: Bloom filters cannot delete — the filter
          is REBUILT from the remaining seen hashes (one pass over the seen
          table; the documented rebuild story).

        ``requeue=True`` additionally re-enqueues the evicted URLs into the
        frontier (priority 0, provider 'recrawl') in the SAME commit, so the
        next ``run()`` re-fetches them — the full re-crawl loop. Commits a
        new warehouse round (snapshots: seen + filter [+ frontier]) so
        eviction is atomic and resume-exact like any crawl round. Returns
        the number of evicted seen rows."""
        sp = self.spark
        seen = self.wh.read_state(sp, "seen", schemas.SEEN)
        ev = enrich(urls.select("url")).select(
            F.col("curl").alias("_eurl"), F.col("url_hash").alias("_ehash")
        )
        cond = (seen["url_hash"] == ev["_ehash"]) & (seen["url"] == ev["_eurl"])
        removed = seen.join(ev, cond, "semi").persist()
        n = removed.count()
        if n == 0:
            removed.unpersist()
            return 0
        new_seen = seen.join(ev, cond, "left_anti")
        tname = self._filter_table
        empty_hashes = sp.createDataFrame([], "url_hash long")
        if self.settings.crawl.seen_filter == "cuckoo":
            prev = self.wh.read_state(sp, tname) if self.wh.has_table(tname) else None
            filter_df = self._filter_update(
                empty_hashes, prev, deletes=removed.select("url_hash")
            )
        else:
            filter_df = self._filter_update(new_seen.select("url_hash"), None)
        round_ = self.wh.last_round() + 1
        snapshots = {"seen": new_seen, tname: filter_df}
        if requeue:
            frontier = enrich(
                self.wh.read_state(sp, "frontier", schemas.FRONTIER)
            ).select(*ENRICHED_COLS)
            req = enrich(
                removed.select(
                    "url",
                    F.lit(None).cast("string").alias("host"),
                    F.lit(0).cast("int").alias("priority"),
                    F.lit(None).cast("timestamp").alias("warc_ts"),
                    F.lit("recrawl").alias("provider"),
                    F.lit(round_).cast("int").alias("discovered_round"),
                    F.lit(0).cast("int").alias("retries"),
                )
            ).withColumn("host", F.col("chost")).select(*ENRICHED_COLS)
            snapshots["frontier"] = frontier.unionByName(req)
        self.wh.commit_round(round_, snapshots=snapshots)
        removed.unpersist()
        return n

    # ------------------------------------------------------------------
    def run(self, max_rounds: int | None = None) -> list[RoundResult]:
        """Crawl until the frontier drains (or max_rounds). Resumable: picks up
        from the last committed round."""
        max_rounds = max_rounds or self.settings.crawl.max_rounds
        frontier, seen, bloom, next_key, round_ = self._load_state()
        results: list[RoundResult] = []
        if frontier.isEmpty():  # only the resume/seed boundary needs a probe
            return results
        # AQE off inside the round loop: AQE re-executes cached subtrees for
        # actions on frames derived from the round's persisted state (observed
        # via event-log stage RDDs), multiplying the per-round work. The loop
        # sets its own partition counts, so AQE has nothing to optimize here.
        prev_aqe = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            for _ in range(max_rounds):
                rr, frontier, seen, bloom, next_key = self.run_round(
                    round_, frontier, seen, bloom, next_key
                )
                results.append(rr)
                round_ += 1
                if rr.frontier_left == 0:
                    break
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        return results

    # ------------------------------------------------------------------
    def run_round(
        self,
        round_: int,
        frontier: DataFrame,
        seen: DataFrame,
        bloom: "PartitionedBloom | DataFrame | None",
        next_key: int,
    ) -> tuple[RoundResult, DataFrame, DataFrame, "PartitionedBloom | DataFrame | None", int]:
        s = self.settings.crawl
        sp = self.spark
        tm = _Timer(round_)
        _pins: list = []

        base = enrich(frontier)

        # 2. robots (broadcast dim): prefix match on the canonical path
        rb = self.robots.select("host", "disallow_prefixes", "max_per_round")
        base = base.join(F.broadcast(rb), base["chost"] == rb["host"], "left").drop(
            rb["host"]
        )
        base = base.withColumn(
            "blocked",
            F.coalesce(
                F.exists("disallow_prefixes", lambda p: F.col("path").startswith(p)),
                F.lit(False),
            ),
        )

        # in-batch duplicate canonicals — blocked/is_seen are functions of curl,
        # so every row of a curl-partition shares them and the window may run
        # over the full partition. The window's shuffle runs BEFORE the bloom
        # probe on purpose: a pandas UDF directly above a file scan triggers
        # Spark 4's PythonRunner selector-spin (see extract.py); fed from the
        # window's exchange instead, the probe streams.
        w_dup = Window.partitionBy("curl").orderBy(*[F.col(c).asc() for c in ORDER])
        base = base.withColumn("dup_rn", F.row_number().over(w_dup))

        # 3. seen-set membership (bloom-routed exact confirm, seen.py) —
        # `bloom` is a driver PartitionedBloom (broadcast probe, small
        # filters) or the warehouse DataFrame (bucket-routed cogroup probe,
        # the 10^10-URL path; settings.bloom_probe)
        base = split_new_vs_seen(
            base, seen, bloom if s.bloom_enabled else None,
            bloom_buckets=s.seen_buckets,
            keep=_pins,
        ).persist()

        if s.budget_override is not None:  # bulk/bench mode
            budget = F.lit(s.budget_override)
        else:
            budget = F.coalesce(F.col("max_per_round"), F.lit(s.default_host_budget))

        # opt-in trap derating (settings.crawl.trap_detect): flag hosts whose
        # candidate URL shapes look like crawler traps and divide their
        # budget. The host-level trap frame is one combinable agg over the
        # cached batch; the join re-keys the batch by chost — an extra
        # data-scale shuffle, which is why the knob defaults OFF and the
        # derate runs only when the politeness windows run at all (not bulk)
        if s.trap_detect and s.budget_override is None:
            from .canonical import url_trap_signals

            traps = url_trap_signals(
                base.select(F.col("curl").alias("url"), F.col("chost").alias("host"))
            ).select(F.col("host").alias("chost"), "trap")
            # the persisted batch must stay reachable for the end-of-round
            # unpersist — rebinding `base` to the (un-cached) join would
            # leak one batch cache per round
            _pins.append(base)
            base = base.join(traps, "chost", "left")
            budget = F.when(
                F.coalesce(F.col("trap"), F.lit(False)),
                F.greatest(
                    F.floor(budget / F.lit(s.trap_budget_divisor)), F.lit(1)
                ).cast("int"),
            ).otherwise(budget)

        # 4. politeness: two-phase exact per-host top-k over ELIGIBLE rows only
        #    (windows must see only eligible rows — a masked row_number would
        #    still count ineligible partition members)
        elig = base.filter(~F.col("blocked") & ~F.col("is_seen") & (F.col("dup_rn") == 1))
        bulk = s.budget_override is not None and s.budget_override >= 1_000_000_000
        if bulk:
            # bulk/throughput mode: budget exceeds any host's candidate count,
            # so selection == eligibility and both windows are provably no-ops
            elig = elig.persist()
            cand = elig
            selected = elig
            defer_salt = elig.filter(F.lit(False))
            defer_host = defer_salt
        else:
            salt_n = s.salt_partitions or int(sp.conf.get("spark.sql.shuffle.partitions"))
            w_salt = Window.partitionBy(
                "chost", F.pmod(F.col("url_hash"), F.lit(salt_n))
            ).orderBy(*[F.col(c).asc() for c in ORDER])
            elig = elig.withColumn("salt_rn", F.row_number().over(w_salt)).persist()

            # salt losers can never be in the exact host top-k (each salt keeps
            # its own top-budget) — they defer without the host-level window
            defer_salt = elig.filter(F.col("salt_rn") > budget)
            cand = elig.filter(F.col("salt_rn") <= budget)
            w_host = Window.partitionBy("chost").orderBy(*[F.col(c).asc() for c in ORDER])
            cand = cand.withColumn("host_rn", F.row_number().over(w_host)).persist()
            defer_host = cand.filter(F.col("host_rn") > budget)
            selected = cand.filter(F.col("host_rn") <= budget)

        # 6. fetch PROBE: payload-free hit test. The pages index is joined
        #    WITHOUT its html column (parquet column pruning ⇒ no payload IO
        #    or shuffle here); the hit is confirmed on the canonical-url
        #    STRING, so an xxhash64 collision can never fetch another page's
        #    html (reference dedups on the exact id string,
        #    src/storage/surrogate_key.rs:24-34).
        #    SHUFFLE_HASH hint: Catalyst's size estimate would otherwise pick
        #    broadcast for the (compressed-parquet-small) index — wrong at
        #    10^10 pages; partitioned hash join on url_hash is the plan a
        #    bucketed Iceberg index makes shuffle-free on the pages side.
        probe = self.pages_idx.select(
            F.col("url_hash").alias("p_hash"), "page_curl"
        ).hint("SHUFFLE_HASH")
        statused = (
            selected.join(probe, (F.col("url_hash") == F.col("p_hash"))
                          & (F.col("curl") == F.col("page_curl")), "left")
            .withColumn("has_page", F.col("page_curl").isNotNull())
            .drop("p_hash", "page_curl")
        )
        if self.cache_idx is not None:
            cprobe = self.cache_idx.select(
                F.col("url_hash").alias("c_hash"),
                F.col("page_curl").alias("cache_curl"),
            ).hint("SHUFFLE_HASH")
            statused = (
                statused.join(cprobe, (F.col("url_hash") == F.col("c_hash"))
                              & (F.col("curl") == F.col("cache_curl")), "left")
                .withColumn("has_cache", F.col("cache_curl").isNotNull())
                .drop("c_hash", "cache_curl")
            )
        else:
            statused = statused.withColumn("has_cache", F.lit(False))
        statused = statused.withColumn(
            "disposition",
            F.when(F.col("has_page") | F.col("has_cache"), "fetched")
            .when(F.col("retries") < F.lit(s.max_retries), "retried")
            .otherwise("failed"),
        ).persist()

        # 6b + 8. fetch PAYLOAD → extraction, one pipelined pass: html bytes
        #    flow parquet scan → hash join → mapInPandas inside a single stage
        #    chain and are never cached or re-shuffled (the round's only
        #    payload traffic). Cache fallback = src/main.rs:182-203.
        fetched_keys = statused.filter(F.col("disposition") == "fetched").select(
            "curl", "url_hash", "provider"
        )
        pg = self.pages_idx.select(
            F.col("url_hash").alias("p_hash"), "page_curl", "html"
        ).hint("SHUFFLE_HASH")
        feed = (
            fetched_keys.join(pg, (F.col("url_hash") == F.col("p_hash"))
                              & (F.col("curl") == F.col("page_curl")), "left")
            .drop("p_hash", "page_curl")
        )
        if self.cache_idx is not None:
            cp = self.cache_idx.select(
                F.col("url_hash").alias("c_hash"),
                F.col("page_curl").alias("c_curl"),
                F.col("html").alias("c_html"),
            ).hint("SHUFFLE_HASH")
            feed = (
                feed.join(cp, (F.col("url_hash") == F.col("c_hash"))
                          & (F.col("curl") == F.col("c_curl")), "left")
                .withColumn("html", F.coalesce(F.col("html"), F.col("c_html")))
                .drop("c_hash", "c_curl", "c_html")
            )
        # 3× finer than the shuffle default: extraction tasks are the longest
        # in the round (Python-bound), so small tasks pack the executors and
        # cut the straggler tail; the exchange also keeps the UDF off the
        # join stage (see the selector-spin note above)
        feed_x = feed.select(F.col("curl").alias("url"), "html", "provider").repartition(
            int(sp.conf.get("spark.sql.shuffle.partitions")) * 3
        )
        if s.discover_links:
            # FUSED discovery (round-4 verdict #2): href extraction runs
            # JVM-side (canonical.extract_links_expr) in the projection
            # feeding the extraction UDF — post-shuffle, same stage — and the
            # UDF threads the array through to a per-page 'links' row in the
            # persisted extraction output. ONE pages-index payload join per
            # round; the frontier union below reads the cache, not the join.
            from .canonical import extract_links_expr

            feed_x = feed_x.withColumn(
                "outlinks", extract_links_expr(F.col("html"), F.col("url"))
            )
        extracted = extract_pages(
            feed_x,
            self.fields,
            self.settings.abcd.landing_page_field,
            self.landing_base_url,
            with_outlinks=s.discover_links,
        ).persist()

        # 5. crawl order seq + 7. dense surrogate keys — skew-robust global
        #    numbering via ONE fused range repartition (seen.rank_and_key);
        #    the host-partitioned two-level variant is equivalent but would
        #    put the skewed host's whole batch in one task. ``ranked`` is
        #    persisted and force-materialized INSIDE the counters action
        #    below: its four consumers (crawl_log, seen, both key_map joins)
        #    run as concurrent commit writes, and a lazily-materialized cache
        #    would serialize them on the cache-fill lock.
        ranked = rank_and_key(
            statused.select("curl", "url_hash", "chost", "priority", "warc_ts", "url",
                            (F.col("disposition") == "fetched").alias("is_fetched")),
            ["chost", "priority", "warc_ts", "curl"],
            fetched_col="is_fetched",
            key_offset=next_key - 1,
            keep=_pins,
        ).persist()
        _pins.append(ranked)

        tm.lap("politeness+fetch plan")
        # ALL round counters in ONE action: non-selected dispositions union the
        # selected/fetch-statused ones AND the extraction kinds (each branch
        # reads a cached parent) — drop/eligibility/fetch/extraction counts
        # previously cost separate barriers
        rest_disp = (
            F.when(F.col("blocked"), "blocked")
            .when(F.col("is_seen"), "dup_seen")
            .otherwise("dup_batch")
        )
        rest = base.filter(
            F.col("blocked") | F.col("is_seen") | (F.col("dup_rn") > 1)
        ).select(rest_disp.alias("disposition"))
        deferred_disp = (
            defer_salt.select(F.lit("deferred").alias("disposition"))
            .unionByName(defer_host.select(F.lit("deferred").alias("disposition")))
        )
        ex_kinds = extracted.select(
            F.concat(F.lit("x_"), F.col("kind")).alias("disposition")
        )
        c1 = {
            r["disposition"]: r["count"]
            for r in statused.select("disposition")
            .unionByName(rest)
            .unionByName(deferred_disp)
            .unionByName(ex_kinds)
            .unionByName(ranked.select(F.lit("x_ranked").alias("disposition")))
            .groupBy("disposition")
            .count()
            .collect()
        }
        tm.lap("all counters")
        n_fetched = c1.get("fetched", 0)
        n_retried = c1.get("retried", 0)
        n_failed = c1.get("failed", 0)
        n_blocked = c1.get("blocked", 0)
        n_dedup = c1.get("dup_seen", 0) + c1.get("dup_batch", 0)
        n_deferred = c1.get("deferred", 0)
        n_datasets = c1.get("x_dataset", 0)
        n_units = c1.get("x_unit", 0)

        crawl_log = ranked.select(
            F.lit(round_).alias("round"),
            "seq",
            F.col("curl").alias("url"),
            F.col("chost").alias("host"),
            F.col("is_fetched").alias("fetched"),
        )

        new_seen = ranked.filter(F.col("is_fetched")).select(
            F.col("curl").alias("url"), "url_hash", "surrogate_key",
            F.lit(round_).alias("first_round"),
        )

        datasets, units = split_dataset_units(extracted, self.fields)
        key_map = new_seen.select("url", "surrogate_key")
        datasets = datasets.join(key_map, "url", "left")
        units = units.join(key_map, "url", "left")

        # opt-in post-round curation (CrawlSettings.curate): quality-gate +
        # near-dup verdicts over THIS round's extracted text, appended as the
        # auditable 'curation' table. Reads the persisted `extracted` cache
        # via `datasets` — no extra payload pass. doc_id packs
        # (surrogate_key, member_index) into one long (member_index < 2^16 —
        # zip archives are far smaller than that).
        extra_appends: dict[str, DataFrame] = {}
        if s.curate:
            from .textops import curation_decisions

            ds_fields, _ = self.fields.split()
            text_cols = [f.hash for f in ds_fields if not f.numeric]
            corpus = datasets.select(
                "url", "member_index",
                (F.col("surrogate_key") * (1 << 16) + F.col("member_index"))
                .alias("doc_id"),
                F.concat_ws(
                    " ", *[F.coalesce(F.col(c), F.lit("")) for c in text_cols]
                ).alias("text"),
            )
            decisions = curation_decisions(
                corpus.select("doc_id", "text"),
                jaccard_threshold=s.curate_jaccard_threshold,
            )
            extra_appends["curation"] = (
                corpus.select("url", "member_index", "doc_id")
                .join(decisions, "doc_id")
                .select(
                    F.lit(round_).alias("round"), "url", "member_index",
                    "keep", "reason",
                )
            )

        # the 1-row metrics record is pure driver data — written with pyarrow
        # directly (no Spark job), schema matching schemas.METRICS
        import pyarrow as pa

        metrics_tbl = pa.table(
            {
                "round": pa.array([round_], pa.int32()),
                "fetched": pa.array([n_fetched], pa.int64()),
                "deduped": pa.array([n_dedup], pa.int64()),
                "robots_blocked": pa.array([n_blocked], pa.int64()),
                "retried": pa.array([n_retried], pa.int64()),
                "failed": pa.array([n_failed], pa.int64()),
                "new_urls": pa.array([n_fetched], pa.int64()),
                "datasets": pa.array([n_datasets], pa.int64()),
                "units": pa.array([n_units], pa.int64()),
            }
        )

        # per-partition lineage of the fetch stage (north_rule counters+lineage)
        lineage = (
            statused.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .select(
                F.lit(round_).alias("round"),
                F.lit("fetch").alias("stage"),
                "partition_id",
                F.col("count").alias("rows"),
            )
        )

        # 9. next frontier state (keeps canonical columns — no re-enrichment)
        deferred = defer_salt.select(*ENRICHED_COLS).unionByName(
            defer_host.select(*ENRICHED_COLS)
        )
        retried_rows = (
            statused.filter(F.col("disposition") == "retried")
            .withColumn("retries", F.col("retries") + 1)
            .select(*ENRICHED_COLS)
        )
        new_frontier = deferred.unionByName(retried_rows)
        if s.discover_links:
            # opt-in frontier growth: outlinks of this round's fetched pages
            # become next-round candidates (next round's seen/dup machinery
            # filters re-discoveries exactly — no pre-filter needed here).
            # Reads the per-page 'links' rows from the PERSISTED extraction
            # output — the payload was read exactly once, in the fused
            # extraction pass above.
            discovered = (
                enrich(
                    extracted.filter(F.col("kind") == "links")
                    .select(F.explode("outlinks").alias("url"))
                    .withColumn("host", F.lit(None).cast("string"))
                    .withColumn("priority", F.lit(s.discovered_priority).cast("int"))
                    .withColumn("warc_ts", F.lit(None).cast("timestamp"))
                    .withColumn("provider", F.lit("discovered"))
                    .withColumn("discovered_round", F.lit(round_).cast("int"))
                    .withColumn("retries", F.lit(0).cast("int"))
                )
                .withColumn("host", F.col("chost"))
                .select(*ENRICHED_COLS)
            )
            new_frontier = new_frontier.unionByName(discovered)
        new_seen_all = seen.unionByName(new_seen)

        # update the prefilter with this round's new hashes — EXECUTOR-side
        # per-bucket cogroup (seen.distributed_bloom_update / _cuckoo_update);
        # the driver never collects url hashes. The cogroup job runs inside
        # the commit's parallel write wave.
        tm.lap("pre-bloom")
        tname = self._filter_table
        if self.wh.has_table(tname):
            prev_bloom_df = self.wh.read_state(sp, tname)
        elif isinstance(bloom, DataFrame):
            prev_bloom_df = bloom
        elif isinstance(bloom, PartitionedBloom) and bloom.bitmaps:
            prev_bloom_df = sp.createDataFrame(bloom.to_rows(), schemas.BLOOM)
        elif isinstance(bloom, PartitionedCuckoo) and bloom.tables:
            prev_bloom_df = sp.createDataFrame(bloom.to_rows(), schemas.CUCKOO)
        else:
            prev_bloom_df = None
        bloom_df = self._filter_update(new_seen.select("url_hash"), prev_bloom_df)
        tm.lap("bloom plan")

        # sort-on-write (S21, the reference's post-load CLUSTER analog,
        # src/storage/database_sink.rs:408-489): committed dataset/unit files
        # are ordered by surrogate_key; footer stats land in the manifest
        self.wh.commit_round(
            round_,
            snapshots={"frontier": new_frontier, "seen": new_seen_all, tname: bloom_df},
            appends={
                "crawl_log": crawl_log,
                "lineage": lineage,
                "datasets": datasets.sortWithinPartitions("surrogate_key"),
                "units": units.sortWithinPartitions("surrogate_key"),
                **extra_appends,
            },
            local_appends={"metrics": metrics_tbl},
            stats_cols={"datasets": ["surrogate_key"], "units": ["surrogate_key"],
                        "frontier": []},
        )

        tm.lap("commit")
        for df in (base, elig, cand, statused, extracted, *_pins):
            df.unpersist()
        # next round's bloom probe: rebuild from the committed bitmap table —
        # correct on both the normal and the idempotent-re-commit path. In
        # routed mode this is just the table handle (never collected).
        bloom = self._bloom_from_warehouse()

        # re-read committed state so the next round's plan starts from files,
        # not from an ever-growing lineage
        frontier2 = self.wh.read_state(sp, "frontier", schemas.FRONTIER)
        seen2 = self.wh.read_state(sp, "seen", schemas.SEEN)

        if s.discover_links:
            # discovered rows ride the committed frontier snapshot; its
            # parquet-footer row count (already in the manifest — no extra
            # job) is the exact frontier size including discoveries
            frontier_left = self.wh.manifest()["tables"]["frontier"]["stats"][
                str(round_)
            ]["rows"]
        else:
            frontier_left = n_deferred + n_retried
        rr = RoundResult(
            round=round_,
            fetched=n_fetched,
            deduped=n_dedup,
            robots_blocked=n_blocked,
            retried=n_retried,
            failed=n_failed,
            new_urls=n_fetched,
            datasets=n_datasets,
            units=n_units,
            frontier_left=frontier_left,
        )
        return rr, frontier2, seen2, bloom, next_key + n_fetched
