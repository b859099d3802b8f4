"""Pure-Python sequential simulator of the crawl semantics (SURVEY.md §5d).

Simulates the reference loop's behavior (/root/reference/src/main.rs:141-275 +
src/storage/surrogate_key.rs:24-34 first-seen keys) under the engine's
round/politeness contract (scheduler.py module docstring). The engine must
reproduce, exactly: crawl order per round, the final seen set with dense
surrogate keys, and the per-round counters.

Pure Python: no Spark, no pandas — an independent implementation sharing only
canonical.canonicalize_py / xxhash64_py (which are themselves asserted against
the Spark expressions in test_canonical.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawlspark.canonical import canonicalize_py, host_py, xxhash64_py


@dataclass
class SimResult:
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)  # (round, seq, curl)
    seen: dict[str, int] = field(default_factory=dict)  # curl -> surrogate_key
    metrics: list[dict] = field(default_factory=list)


def _path_of(curl: str) -> str:
    rest = curl.split("://", 1)[1]
    i = len(rest)
    for ch in "/?":
        j = rest.find(ch)
        if j >= 0:
            i = min(i, j)
    pq = rest[i:]
    return pq.split("?", 1)[0]


def simulate(
    frontier_rows: list[dict],
    page_urls: set[str],
    robots: dict[str, dict],
    cache_urls: set[str] | None = None,
    default_budget: int = 8,
    max_retries: int = 1,
    max_rounds: int = 64,
) -> SimResult:
    """frontier_rows: dicts with url/priority/warc_ts (datetime)/retries.
    page_urls / cache_urls: raw url strings of fetchable pages (canonicalized
    here). robots: host -> {disallow_prefixes, max_per_round}."""
    cache_urls = cache_urls or set()
    page_set = {canonicalize_py(u) for u in page_urls}
    cache_set = {canonicalize_py(u) for u in cache_urls}

    frontier = [dict(r) for r in frontier_rows]
    for r in frontier:
        r.setdefault("retries", 0)
        r["curl"] = canonicalize_py(r["url"])
        r["chost"] = host_py(r["curl"])
        r["path"] = _path_of(r["curl"])

    res = SimResult()
    next_key = 1

    for round_ in range(max_rounds):
        if not frontier:
            break
        fetched_n = deduped = blocked_n = retried_n = failed_n = 0

        keep: list[dict] = []
        eligible: list[dict] = []
        for r in frontier:
            rb = robots.get(r["chost"], {})
            prefixes = rb.get("disallow_prefixes") or []
            if any(r["path"].startswith(p) for p in prefixes):
                blocked_n += 1
                continue
            if r["curl"] in res.seen:
                deduped += 1
                continue
            eligible.append(r)

        # in-batch dedup: first by (priority, warc_ts, url) per curl
        eligible.sort(key=lambda r: (r["priority"], r["warc_ts"], r["curl"], r["url"]))
        batch_seen: set[str] = set()
        unique: list[dict] = []
        for r in eligible:
            if r["curl"] in batch_seen:
                deduped += 1
            else:
                batch_seen.add(r["curl"])
                unique.append(r)

        # politeness: per-host top-k by (priority, warc_ts, curl, url)
        by_host: dict[str, list[dict]] = {}
        for r in unique:
            by_host.setdefault(r["chost"], []).append(r)
        selected: list[dict] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r["priority"], r["warc_ts"], r["curl"], r["url"]))
            budget = robots.get(host, {}).get("max_per_round") or default_budget
            selected.extend(rows[:budget])
            keep.extend(rows[budget:])  # deferred

        # crawl order: (chost, priority, warc_ts, curl)
        selected.sort(key=lambda r: (r["chost"], r["priority"], r["warc_ts"], r["curl"]))
        for seq, r in enumerate(selected, start=1):
            res.crawl_order.append((round_, seq, r["curl"]))

        # fetch + keys in crawl order
        for r in selected:
            if r["curl"] in page_set or r["curl"] in cache_set:
                fetched_n += 1
                res.seen[r["curl"]] = next_key
                next_key += 1
            elif r["retries"] < max_retries:
                retried_n += 1
                r2 = dict(r)
                r2["retries"] += 1
                keep.append(r2)
            else:
                failed_n += 1

        res.metrics.append(
            dict(
                round=round_,
                fetched=fetched_n,
                deduped=deduped,
                robots_blocked=blocked_n,
                retried=retried_n,
                failed=failed_n,
                new_urls=fetched_n,
            )
        )
        frontier = keep

    # attach hashes for seen-set comparison
    res.seen_hashes = {u: xxhash64_py(u) for u in res.seen}  # type: ignore[attr-defined]
    return res
