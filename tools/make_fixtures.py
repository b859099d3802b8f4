#!/usr/bin/env python
"""Generate oracle fixture parquets for the non-SQL-expressible battery
queries (driver CORRECTNESS gate runs at sf=0.01).

Each fixture is computed by an INDEPENDENT pure-Python mirror (no Spark, no
crawlspark expression code) of the documented algorithm — the same oracle
strategy as tests/oracle_sim.py for the crawl and the reference's golden
fixtures (/root/reference/src/abcd/abcd_parser.rs:232-298):

* extraction_units  — unit rows derived from the synth TEMPLATE values
  (synth.unit_values), not from running the parser.
* dedup_minhash     — pure-Python xxhash64 (canonical.xxhash64_py) MinHash
  signatures + banding + exact-Jaccard verify.
* dedup_simhash     — pure-Python SimHash votes + chunk pigeonhole + hamming.
* ann_lsh           — numpy-free sign-sketch + cosine mirror with Spark's
  exact float semantics (float32 products, float64 accumulation, array-order
  folds).
* embed_neardup     — banded sign-sketches + cosine ≥ threshold mirror.

Integer ops mirror Spark's non-ANSI Java semantics: 64-bit wrap-around adds /
multiplies, truncated (sign-of-dividend) %, arithmetic shifts.

Run from the repo root:  python tools/make_fixtures.py
Outputs land in tests/fixtures/oracle_sf001/*.parquet (committed).
"""

from __future__ import annotations

import math
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from crawlspark.canonical import xxhash64_py  # noqa: E402
from crawlspark import synth  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "tests" / "fixtures" / "oracle_sf001"

_M64 = 1 << 64


def i64(x: int) -> int:
    """Wrap to signed 64-bit (Java long overflow semantics)."""
    x &= _M64 - 1
    return x - _M64 if x >= (1 << 63) else x


def jmod(h: int, m: int) -> int:
    """Java % : remainder with the sign of the dividend."""
    r = abs(h) % m
    return r if h >= 0 else -r


def round6(x: float) -> float:
    """Spark F.round — HALF_UP decimal rounding (python round is banker's)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def load_documents() -> list[tuple[int, str]]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def load_embeddings() -> list[tuple[int, list[float]]]:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    return list(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))


def f32(x: float) -> float:
    """Round a python float to float32 precision (Spark FloatType value)."""
    return struct.unpack("f", struct.pack("f", x))[0]


# ---------------------------------------------------------------------------
# extraction_units (S8+S9) — from the synth template, not the parser
# ---------------------------------------------------------------------------

def extraction_units_fixture() -> pa.Table:
    urls, mis, uis, uids, lons = [], [], [], [], []
    n_hosts = 5
    for i in range(40):
        url = synth.page_url(i, n_hosts)
        for m in range(synth.n_members(i)):
            if synth.member_is_garbage(i, m):
                continue
            for j in range(synth.n_units(i, m)):
                v = synth.unit_values(i, m, j)
                urls.append(url)
                mis.append(m)
                uis.append(j)
                uids.append(v["unit_id"])
                lons.append(None if v["lon"] == "N/A" else float(v["lon"]))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "member_index": pa.array(mis, pa.int32()),
            "unit_index": pa.array(uis, pa.int32()),
            "unit_id": pa.array(uids, pa.string()),
            "lon": pa.array(lons, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# minhash
# ---------------------------------------------------------------------------

def shingle_set(text: str, n: int = 3) -> list[str]:
    words = text.split(" ")
    k = len(words) - (n - 1)
    sh = [" ".join(words[i : i + n]) for i in range(k)] if k >= 1 else [" ".join(words)]
    seen, out = set(), []
    for s in sh:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def minhash_sig(text: str, num: int = 16) -> list[int]:
    # mirrors textops.minhash_signature: both base hashes logically
    # right-shifted into [0, 2^(64-shift)) so h1 + j*h2 < 2^63 for every
    # j < num — plain non-wrapping integer arithmetic, ANSI-session-safe
    shift = (num - 1).bit_length() + 1
    mins = [0x7FFFFFFFFFFFFFFF] * num
    for s in shingle_set(text):
        h1 = (xxhash64_py(s) & (_M64 - 1)) >> shift
        h2 = (xxhash64_py("mh2|" + s) & (_M64 - 1)) >> shift
        for j in range(num):
            v = h1 + j * h2
            if v < mins[j]:
                mins[j] = v
    return mins


def shingle_list(text: str, n: int = 3) -> list[str]:
    """Positional (non-deduplicated) word n-grams."""
    words = text.split(" ")
    k = len(words) - (n - 1)
    return [" ".join(words[i : i + n]) for i in range(k)] if k >= 1 else [" ".join(words)]


def winnow_fixture(docs) -> pa.Table:
    """Mirror of textops.winnow_fingerprints (Schleimer et al. 2003):
    xxhash64 over positional 3-gram shingles, window-4 minima, distinct."""
    n, w = 3, 4
    ids, fps = [], []
    for doc_id, text in docs:
        hs = [xxhash64_py(s) for s in shingle_list(text, n)]
        nwin = max(len(hs) - (w - 1), 1)
        seen = set()
        for i in range(nwin):
            m = min(hs[i : i + w])
            if m not in seen:
                seen.add(m)
                ids.append(doc_id)
                fps.append(m)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "fp": pa.array(fps, pa.int64())}
    )


def docs_with_dups(docs, mod=25, offset=1000000):
    return docs + [(d + offset, t) for d, t in docs if d % mod == 0]


def minhash_pairs_py(d: list[tuple[int, str]], thr: float) -> list[tuple[int, int, float]]:
    """Verified MinHash-LSH pair mirror over an arbitrary corpus (per-doc
    signatures + banding + exact-Jaccard verify — no rep collapse, which is
    provably equivalent: signatures depend only on text)."""
    num, bands, rpb = 16, 4, 4
    buckets: dict[tuple[int, int], list[int]] = {}
    texts = dict(d)
    for doc_id, text in d:
        sig = minhash_sig(text, num)
        for b in range(bands):
            key = xxhash64_py(",".join(str(sig[b * rpb + r]) for r in range(rpb)))
            buckets.setdefault((b, key), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    rows = []
    for a, b in sorted(pairs):
        sa, sb = set(shingle_set(texts[a])), set(shingle_set(texts[b]))
        jac = len(sa & sb) / len(sa | sb)
        if jac >= thr:
            rows.append((a, b, round6(jac)))
    return rows


def minhash_fixture(docs) -> pa.Table:
    rows = minhash_pairs_py(docs_with_dups(docs), 0.8)
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# pipeline_curate — the composed LLM-curation chain, mirrored end-to-end
# ---------------------------------------------------------------------------

def gopher_keep_py(text: str) -> bool:
    """Mirror of textops.gopher_quality_rules' keep conjunction (same
    length/replace stopword-count semantics as the SQL oracle)."""
    import re

    words = text.split(" ")
    nw = len(words)
    mwl = len(text) / nw
    aw = sum(1 for w in words if re.search("[a-zA-Z]", w))
    p = " " + text + " "
    sh = sum(
        (len(p) - len(p.replace(f" {w} ", ""))) // (len(w) + 2)
        for w in ["the", "and", "of", "to", "in"]
    )
    return 20 <= nw <= 100_000 and 3.0 <= mwl <= 10.0 and aw / nw >= 0.8 and sh >= 2


def pipeline_curate_fixture(docs) -> pa.Table:
    """The full curation chain: gopher gates → minhash near-dup pairs →
    connected components (union-find) → keepers + unpaired survivors →
    token counts. Independent of every crawlspark expression."""
    d = docs_with_dups(docs)
    gated = [(i, t) for i, t in d if gopher_keep_py(t)]
    pairs = minhash_pairs_py(gated, 0.8)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    paired = {x for a, b, _ in pairs for x in (a, b)}
    rows = [
        (i, len(t.split(" ")), -(-len(t) // 4))
        for i, t in gated
        if i not in paired or find(i) == i
    ]
    rows.sort()
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "ws_tokens": pa.array([r[1] for r in rows], pa.int64()),
            "bpe_est_tokens": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    votes = [0] * 64
    for tok in text.split(" "):
        th = xxhash64_py(tok)
        for i in range(64):
            votes[i] += 1 if (th >> i) & 1 else -1
    h = 0
    for i in range(64):
        if votes[i] > 0:
            h |= 1 << i
    return i64(h)


def simhash_fixture(docs) -> pa.Table:
    d = docs_with_dups(docs)
    hashes = {doc_id: simhash64(text) for doc_id, text in d}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, h in hashes.items():
        for c in range(4):
            buckets.setdefault((c, (h >> (c * 16)) & 0xFFFF), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    rows = []
    for a, b in sorted(pairs):
        ham = bin((hashes[a] ^ hashes[b]) & (_M64 - 1)).count("1")
        if ham <= 3:
            rows.append((a, b, ham))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# sign sketches / cosine (Spark float semantics: float32 products, float64
# accumulation in array order)
# ---------------------------------------------------------------------------

def plane_weight(i: int, p: int) -> float:
    return float(jmod(xxhash64_py(f"{i}_{p}"), 1000)) / 500.0 - 1.0


def sign_sketch(vec: list[float], planes: int, offset: int = 0) -> int:
    out = 0
    for p in range(planes):
        acc = 0.0
        for i, v in enumerate(vec):
            acc += v * plane_weight(i, offset + p)
        if acc > 0:
            out |= 1 << p
    return out


def cosine(a: list[float], b: list[float]) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += f32(x * y)
    na = 0.0
    for x in a:
        na += f32(x * x)
    nb = 0.0
    for y in b:
        nb += f32(y * y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ann_lsh_fixture(embs) -> pa.Table:
    # mirrors textops.ann_lsh_topk with multi_probe=True: candidate buckets
    # are the query's sketch plus its `planes` hamming-1 neighbors
    planes, k, qid = 6, 10, 0
    sk = {vid: sign_sketch(vec, planes) for vid, vec in embs}
    vecs = dict(embs)
    probes = {sk[qid]} | {sk[qid] ^ (1 << p) for p in range(planes)}
    scored = [
        (cosine(vecs[vid], vecs[qid]), vid)
        for vid, s in sk.items()
        if vid != qid and s in probes
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:k]
    return pa.table(
        {
            "vec_id": pa.array([vid for _, vid in top], pa.int64()),
            "rank": pa.array(list(range(1, len(top) + 1)), pa.int32()),
        }
    )


def ann_ivf_fixture(embs) -> pa.Table:
    """Mirror of textops.ann_ivf_topk: centroids = vec_id < nlist, cell
    score = f64 dot / driver-computed centroid norm (the same python
    expression the implementation inlines as a literal), strict-> argmax
    assignment, (score, c)-sorted reversed nprobe probe, exact cosine
    re-rank (f32-product / f64-fold semantics via cosine())."""
    nlist, nprobe, k, qid = 16, 4, 10, 0
    vecs = dict(embs)
    cents = {c: vecs[c] for c in range(nlist)}
    cnorm = {c: math.sqrt(sum(x * x for x in cents[c])) for c in cents}

    def cell_score(v, c):
        dot = 0.0
        for x, w in zip(v, cents[c]):
            dot += x * w
        return dot / cnorm[c]

    def assign(v):
        best = (float("-inf"), -1)
        for c in sorted(cents):
            s = cell_score(v, c)
            if s > best[0]:
                best = (s, c)
        return best[1]

    qscores = sorted((cell_score(vecs[qid], c), c) for c in cents)
    probe_set = {c for _, c in list(reversed(qscores))[:nprobe]}
    cand = [
        (cosine(v, vecs[qid]), vid)
        for vid, v in embs
        if vid != qid and assign(v) in probe_set
    ]
    cand.sort(key=lambda t: (-t[0], t[1]))
    top = cand[:k]
    return pa.table(
        {
            "vec_id": pa.array([vid for _, vid in top], pa.int64()),
            "rank": pa.array(list(range(1, len(top) + 1)), pa.int32()),
        }
    )


def ann_ivf_kmeans_fixture(embs) -> pa.Table:
    """Mirror of textops.ann_ivf_topk(quantizer='kmeans'): deterministic
    Lloyd k-means (init = first nlist sample vectors, fixed 5 iterations,
    members folded in vec_id order, dot/|centroid| strict-> argmax
    assignment, empty cluster keeps its centroid) trained on the
    vec_id < 256 sample, then the same probe + exact-cosine re-rank as
    ann_ivf_fixture over the trained centroids."""
    nlist, nprobe, k, qid, train_n, iters = 16, 4, 10, 0, 256, 5
    vecs = dict(embs)
    sample = sorted((vid, v) for vid, v in embs if vid < train_n)
    cents = {c: [float(x) for x in sample[c][1]] for c in range(nlist)}
    for _ in range(iters):
        norm = {c: math.sqrt(sum(x * x for x in cents[c])) for c in cents}
        sums = {c: [0.0] * len(cents[c]) for c in cents}
        counts = {c: 0 for c in cents}
        for _vid, vec in sample:
            best = (float("-inf"), -1)
            for c in range(nlist):
                dot = 0.0
                for x, w in zip(vec, cents[c]):
                    dot += x * w
                s = dot / norm[c]
                if s > best[0]:
                    best = (s, c)
            cc = best[1]
            counts[cc] += 1
            acc = sums[cc]
            for i, x in enumerate(vec):
                acc[i] += float(x)
        for c in cents:
            if counts[c]:
                cents[c] = [s / counts[c] for s in sums[c]]

    cnorm = {c: math.sqrt(sum(x * x for x in cents[c])) for c in cents}

    def cell_score(v, c):
        dot = 0.0
        for x, w in zip(v, cents[c]):
            dot += x * w
        return dot / cnorm[c]

    def assign(v):
        best = (float("-inf"), -1)
        for c in sorted(cents):
            s = cell_score(v, c)
            if s > best[0]:
                best = (s, c)
        return best[1]

    qscores = sorted((cell_score(vecs[qid], c), c) for c in cents)
    probe_set = {c for _, c in list(reversed(qscores))[:nprobe]}
    cand = [
        (cosine(v, vecs[qid]), vid)
        for vid, v in embs
        if vid != qid and assign(v) in probe_set
    ]
    cand.sort(key=lambda t: (-t[0], t[1]))
    top = cand[:k]
    return pa.table(
        {
            "vec_id": pa.array([vid for _, vid in top], pa.int64()),
            "rank": pa.array(list(range(1, len(top) + 1)), pa.int32()),
        }
    )


def embed_neardup_fixture(embs) -> pa.Table:
    bands, ppb, thr = 4, 16, 0.999
    d = embs + [(vid + 1000000, vec) for vid, vec in embs if vid % 25 == 0]
    vecs = dict(d)
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, vec in d:
        for b in range(bands):
            buckets.setdefault((b, sign_sketch(vec, ppb, b * ppb)), []).append(vid)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    rows = [(a, b) for a, b in sorted(pairs) if cosine(vecs[a], vecs[b]) >= thr]
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    docs = load_documents()
    embs = load_embeddings()
    tables = {
        "extraction_units": extraction_units_fixture(),
        "dedup_minhash": minhash_fixture(docs),
        "dedup_simhash": simhash_fixture(docs),
        "ann_lsh": ann_lsh_fixture(embs),
        "ann_ivf": ann_ivf_fixture(embs),
        "ann_ivf_kmeans": ann_ivf_kmeans_fixture(embs),
        "embed_neardup": embed_neardup_fixture(embs),
        "fingerprint_winnow": winnow_fixture(docs),
        "pipeline_curate": pipeline_curate_fixture(docs),
    }
    for name, tbl in tables.items():
        pq.write_table(tbl, OUT / f"{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
