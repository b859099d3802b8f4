"""crawlspark — a from-scratch PySpark-native URL-frontier + fetch-scheduler
engine with the query/data-processing capabilities of the reference harvester
``gfbio/vat-abcd-crawler`` (see /root/reference, cited per-module as file:line).

Architecture (Spark-first, not a port):

* ``schemas``     — pages/frontier/robots/seen/metrics StructTypes (input_hint shape)
* ``settings``    — layered TOML configuration (reference: src/settings.rs:73-86)
* ``fields``      — extraction field spec + sha1 column naming
                    (reference: src/abcd/abcd_fields.rs, src/storage/field.rs)
* ``canonical``   — RFC-3986 URL canonicalization, pure Spark SQL expressions
* ``synth``       — deterministic synthetic pages/frontier/robots generator
* ``extract``     — THE one pandas-UDF family: ZIP explode + streaming XML parse
                    (reference: src/abcd/archive_reader.rs + src/abcd/abcd_parser.rs)
* ``warehouse``   — atomic snapshot commits + resume (Iceberg-equivalent semantics;
                    reference: src/storage/database_sink.rs:258-284 temp→final swap)
* ``seen``        — distributed URL-seen set: Bloom prefilter + exact anti-join,
                    dense first-seen surrogate keys (src/storage/surrogate_key.rs)
* ``scheduler``   — the crawl round loop: politeness budgets, robots, fetch join,
                    retry/recovery, counters (reference: src/main.rs:141-275)
* ``listing``     — dataset_listing semi-join view (src/storage/database_sink.rs:492-558)
* ``csvsink``     — --file-to-csv parity surface (src/main.rs:54-115)
* ``textops``     — training-data ops: dedup (exact/minhash/simhash), similarity
                    search, language-ID / quality / token counting, fingerprints

Everything is DataFrame-API; RDDs are never used; Python touches data only
through Arrow-vectorized ``mapInPandas`` in ``extract`` (and clearly-stubbed
multimodal decoders in ``multimodal``).
"""

__version__ = "0.1.0"
