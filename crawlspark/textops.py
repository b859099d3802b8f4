"""Training-data pipeline operators over document/embedding tables.

These are the web-scale data-curation ops a 100 TB text pipeline needs on top
of the crawl engine (task brief: dedup, similarity search, text analysis).
All hot paths are JVM-side Spark SQL (higher-order array functions); no
per-row Python anywhere.

Scale notes:
* exact dedup: one hash-groupBy shuffle; map-side partial aggregation applies.
* MinHash+LSH: signatures are computed in a single projection (xxhash64 over
  shingles — whole-stage codegen), candidate generation is a self-join on
  (band_index, band_hash) — the classic shuffle-on-bucket plan whose output is
  ~O(duplicates), not O(n²).
* SimHash: bit votes via explode + 64 conditional sums — one shuffle on doc_id;
  near-dup candidates join on 16-bit chunks (hamming ≤ 3 ⇒ one of 4 chunks
  equal, pigeonhole).
* ANN: brute-force cosine is one broadcast of the query vector and a single
  pass (F.aggregate dot products); the LSH-bucketed variant prunes candidates
  by sign-bit sketch prefix before scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): keeper = min doc_id (first-seen
    analog of src/storage/surrogate_key.rs:24-34 applied to content)."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def shingles_expr(text, n: int = 3):
    """Array of n-word shingles (JVM-side)."""
    words = F.split(text, " ")
    k = F.size(words) - (n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signature(documents: DataFrame, num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """doc_id + minhash signature array (xxhash64 with per-permutation salt)."""
    sh = F.array_distinct(shingles_expr(F.col("text"), shingle_n))

    def perm(j: int):
        # factory, NOT a default-arg lambda: PySpark infers HOF arity from the
        # Python signature, so `lambda s, j=j` would silently become the
        # (element, index) two-arg form
        return lambda s: F.xxhash64(s, F.lit(j))

    sigs = F.array(
        *[F.array_min(F.transform(sh, perm(j))) for j in range(num_hashes)]
    )
    return documents.select("doc_id", sh.alias("shingles"), sigs.alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (a<b) via banded MinHash, verified with exact
    shingle-set Jaccard (no false positives in the output)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(documents, num_hashes, shingle_n).persist()
    # the band self-join carries ONLY (doc_id, band, bucket) — shuffling the
    # shingle arrays through the join/dedup costs ~50x more; shingles are
    # re-attached to the (few) surviving pairs afterwards
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sh = sig.select("doc_id", "shingles")
    cand = (
        pairs.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("shingles", "sa"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("shingles", "sb"), "b")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    jac = inter / union
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: token explode → per-bit
    vote sums → bit reassembly."""
    toks = documents.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return votes.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, candidates
    pruned by 16-bit chunk equality (pigeonhole over 4 chunks)."""
    sh = simhash(documents)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .dropDuplicates(["a", "b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "a", "b", "hamming"
    )


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------

def cosine_expr(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def ann_bruteforce_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors of one vector — the correctness baseline.
    The query vector is a 1-row broadcast; scoring is one scan."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine_expr(F.col("embedding"), F.col("qvec")).alias("cos"))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank")
    )


def sign_sketch_expr(vec, planes: int = 16):
    """LSH sign-bit sketch: bit i = sign of a pseudo-random projection whose
    'plane' is derived deterministically from (i, dimension index) hashes —
    no stored model, reproducible anywhere."""
    dims = F.transform(vec, lambda v, idx: F.struct(v.alias("v"), idx.alias("i")))

    def merge_fn(p: int):
        # factory (see minhash_signature): default-arg lambdas break HOF arity
        return lambda acc, s: acc + s["v"] * (
            (F.xxhash64(s["i"].cast("string"), F.lit(p)) % 1000).cast("double") / 500.0
            - 1.0
        )

    bits = []
    for p in range(planes):
        proj = F.aggregate(dims, F.lit(0.0), merge_fn(p))
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, p))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseXOR(b)
    return out


def ann_lsh_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, planes: int = 8
) -> DataFrame:
    """Bucketed ANN: candidates share the query's sign-sketch bucket (plus
    hamming-1 neighbors via chunking is left to scale tuning); exact cosine
    re-scoring inside the bucket. At 10^10 scale the sketch is the partition
    key, so each query touches one bucket's partitions only."""
    sk = embeddings.withColumn("sketch", sign_sketch_expr(F.col("embedding"), planes))
    q = sk.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("sketch").alias("qsketch")
    )
    cand = sk.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(q), F.col("sketch") == F.col("qsketch")
    )
    scored = cand.select("vec_id", cosine_expr(F.col("embedding"), F.col("qvec")).alias("cos"))
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b). Candidates via sign-sketch
    bucket equality, verified by exact cosine ≥ threshold."""
    sk = embeddings.withColumn("sketch", sign_sketch_expr(F.col("embedding"), 8))
    l, r = sk.alias("l"), sk.alias("r")
    cand = l.join(
        r,
        (F.col("l.sketch") == F.col("r.sketch")) & (F.col("l.vec_id") < F.col("r.vec_id")),
    ).select(
        F.col("l.vec_id").alias("a"),
        F.col("r.vec_id").alias("b"),
        cosine_expr(F.col("l.embedding"), F.col("r.embedding")).alias("cos"),
    )
    return cand.filter(F.col("cos") >= threshold).select("a", "b")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "la", "de"],
}


def _count_occurrences(text, needle: str):
    """Occurrence count via the portable length/replace trick (identical
    semantics in Spark SQL and ANSI SQL — used by the DuckDB oracles)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_id_heuristic(documents: DataFrame) -> DataFrame:
    """n-gram/stopword language ID: argmax of per-language stopword hit counts
    (space-padded needles), ties → 'und'."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(padded, f" {w} ") for w in words[1:]),
            _count_occurrences(padded, f" {words[0]} "),
        )
        for lang, words in _STOPWORDS.items()
    }
    df = documents.select("doc_id", "text", *[v.alias(f"s_{k}") for k, v in scores.items()])
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(f"s_{k}") for k in langs])
    pick = F.lit("und")
    for k in reversed(langs):  # earlier langs win ties (stable argmax)
        pick = F.when((F.col(f"s_{k}") == best) & (best > 0), F.lit(k)).otherwise(pick)
    return df.select("doc_id", pick.alias("lang_pred"), *[f"s_{k}" for k in langs])


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality features: char length, word count, mean word length,
    stopword ratio — integer/exact-division outputs, oracle-safe."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("long")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    stop_hits = sum(
        (_count_occurrences(padded, f" {w} ") for w in ["and", "of"]),
        _count_occurrences(padded, " the "),
    )
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(F.length("text") / n_words, 6).alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        F.round(stop_hits / n_words, 6).alias("stopword_ratio"),
    )


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic +
    punctuation splits), all JVM-side."""
    words = F.split(F.col("text"), " ")
    return documents.select(
        "doc_id",
        F.size(words).cast("long").alias("ws_tokens"),
        (F.ceil(F.length("text") / 4)).cast("long").alias("bpe_est_tokens"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprints: md5 (oracle-portable) + xxhash64 (engine key)."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("md5_fp"),
        F.xxhash64("text").alias("xx_fp"),
    )
