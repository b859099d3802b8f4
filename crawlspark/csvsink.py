"""CSV parity surface — the reference's ``--file-to-csv`` mode.

Reference: /root/reference/src/main.rs:54-115 — header = spec-ordered field
names; one CSV line per *unit* row; values rendered with Rust ``{}`` Display
(floats per src/vat_type.rs:35-42); absent value → empty field; csv-crate
minimal quoting (quote iff the field contains ``"``, ``,``, CR or LF; quotes
doubled).

Note: the reference iterates a HashMap for the header (main.rs:69-73), whose
order is nondeterministic per run; this engine fixes the order to the spec
file order — the only deliberate divergence, documented in SURVEY.md §5.

Float rendering uses one vectorized (Arrow) pandas UDF because shortest-
round-trip-no-exponent formatting has no Spark SQL builtin; everything else is
JVM-side expression.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .fields import AbcdFields
from .rustcompat import f64_display


@F.pandas_udf(StringType())
def rust_fmt(xs: pd.Series) -> pd.Series:
    """Rust `{}` Display of f64 (vectorized)."""
    return xs.map(lambda v: None if pd.isna(v) else f64_display(float(v)))


def csv_quote(col: Column) -> Column:
    """csv-crate minimal quoting (QuoteStyle::Necessary)."""
    needs = col.rlike('[",\r\n]')
    quoted = F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"'))
    return F.when(col.isNull(), F.lit("")).when(needs, quoted).otherwise(col)


def unit_csv_line(fields: AbcdFields) -> Column:
    parts = []
    for f_ in fields:
        c = F.col(f_.hash)
        parts.append(csv_quote(rust_fmt(c) if f_.numeric else c))
    return F.concat_ws(",", *parts)


def render_unit_rows_expr(extracted: DataFrame, fields: AbcdFields) -> DataFrame:
    """Per url: the CSV body of its unit rows in (member_index, unit_index)
    order, newline-terminated — the byte-identical-text invariant column."""
    lines = (
        extracted.filter(F.col("kind") == "unit")
        .withColumn("line", unit_csv_line(fields))
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("member_index", "unit_index", "line"))
            ).alias("ls")
        )
        .select(
            "url",
            F.concat(
                F.array_join(F.transform("ls", lambda s: s["line"]), "\n"), F.lit("\n")
            ).alias("text"),
        )
    )
    # urls whose members produced no unit rows → empty text
    all_urls = extracted.select("url").distinct()
    return all_urls.join(lines, "url", "left").select(
        "url", F.coalesce("text", F.lit("")).alias("text")
    )


def file_to_csv(spark, archive_path: str, fields: AbcdFields, landing_page_field: str) -> str:
    """The full --file-to-csv output (header + unit rows) for one ZIP archive
    (main.rs:54-115). dataset_id/landing/provider are empty in this mode
    (main.rs:84)."""
    from .extract import extract_pages

    with open(archive_path, "rb") as f:
        blob = f.read()
    df = spark.createDataFrame([(archive_path, blob, "")], ["url", "html", "provider"])
    extracted = extract_pages(df, fields, landing_page_field)
    body = render_unit_rows_expr(extracted, fields).collect()[0]["text"]
    header = ",".join(fields.names)  # field paths contain no chars needing quotes
    return header + "\n" + body
