"""Deterministic synthetic Common-Crawl-style test data (FIXTURES.md §1-3).

Everything is a pure function of the row id — no wall clock, no RNG state —
so the same tables are reproducible from Python (tests, oracle) and from Spark
(``spark.range`` + ``mapInPandas`` for bench-scale generation).

* ``pages``    — (url, warc_ts, html, text, lang): html is a ZIP of 1-3 ABCD
  XML member docs (the reference's archive shape, src/abcd/archive_reader.rs);
  ``text`` is the *expected* byte-identical extraction (computed from the
  template values directly, NOT by running the parser — an independent oracle).
* ``frontier`` — seed rows incl. ~5% canonicalization-variant duplicates and
  ~2% unknown urls (fetch-miss path, src/main.rs:182-203 analog).
* ``robots``   — per-host disallow prefixes + politeness budgets.
* ``cache``    — recovery copies for half the unknown urls
  (the reference's storage-dir fallback, src/main.rs:190-203).

Host skew: every 5th page lands on host 0 (~20% of urls) so politeness
budgeting and salted repartitioning are actually exercised (FIXTURES.md §1).
"""

from __future__ import annotations

import io
import zipfile
from datetime import datetime, timedelta, timezone

from .fields import AbcdFields

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
LANGS = ["en", "de", "fr", "es", "la"]
LANDING_BASE = "https://landing.example/landingpage.php"

# the golden 7-field spec, mirroring the reference's inline test spec
# (/root/reference/src/abcd/abcd_parser.rs:350-413)
GOLDEN_SPEC = [
    {"name": "/DataSets/DataSet/TechnicalContacts/TechnicalContact/Name",
     "numeric": False, "vatMandatory": False, "gfbioMandatory": True, "globalField": True, "unit": ""},
    {"name": "/DataSets/DataSet/Metadata/Description/Representation/Title",
     "numeric": False, "vatMandatory": False, "gfbioMandatory": True, "globalField": True, "unit": ""},
    {"name": "/DataSets/DataSet/Metadata/Description/Representation/URI",
     "numeric": False, "vatMandatory": False, "gfbioMandatory": True, "globalField": True, "unit": ""},
    {"name": "/DataSets/DataSet/Units/Unit/UnitID",
     "numeric": False, "vatMandatory": False, "gfbioMandatory": True, "globalField": False, "unit": ""},
    {"name": "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal",
     "numeric": True, "vatMandatory": True, "gfbioMandatory": True, "globalField": False, "unit": "°"},
    {"name": "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LatitudeDecimal",
     "numeric": True, "vatMandatory": True, "gfbioMandatory": True, "globalField": False, "unit": "°"},
    {"name": "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/SpatialDatum",
     "numeric": False, "vatMandatory": False, "gfbioMandatory": True, "globalField": False, "unit": ""},
]

LANDING_PAGE_FIELD = "/DataSets/DataSet/Metadata/Description/Representation/URI"


def golden_fields() -> AbcdFields:
    return AbcdFields.from_list(GOLDEN_SPEC)


def host_of(i: int, n_hosts: int) -> int:
    return 0 if i % 5 == 0 else i % n_hosts


def page_url(i: int, n_hosts: int) -> str:
    return f"https://host{host_of(i, n_hosts)}.example.org/p/{i}"


def warc_ts(i: int) -> datetime:
    return EPOCH + timedelta(seconds=17 * i)


def _frac3(x: int) -> str:
    """3-digit odd fraction — never ends in 0, so shortest-float display of
    the parsed value reproduces the literal byte-for-byte."""
    return f"{((x % 450) * 2 + 101):03d}"


def unit_values(i: int, m: int, j: int) -> dict:
    """Template values for unit j of member m of page i."""
    x = i * 31 + m * 7 + j
    lon = "N/A" if x % 13 == 5 else f"{10 + x % 80}.{_frac3(x)}"
    lat = f"{-40 + x % 80}.{_frac3(x + 1)}"
    return {
        "unit_id": f"unit-{i}-{m}-{j}",
        "lon": lon,          # raw text in the XML
        "lat": lat,
        "datum": "WGS84" if x % 3 else "EPSG:4326",
    }


def n_members(i: int) -> int:
    return 1 + i % 3


def n_units(i: int, m: int) -> int:
    return 1 + (i + m) % 3


def member_is_garbage(i: int, m: int) -> bool:
    """~1% of members are non-ABCD XML → parse_error path (main.rs:236-249)."""
    return (i * 3 + m) % 97 == 0


def member_xml(i: int, m: int) -> bytes:
    if member_is_garbage(i, m):
        return b'<?xml version="1.0"?><NotAbcd><Nothing/></NotAbcd>'
    has_uri = i % 2 == 0
    uri = (
        f"<abcd:URI>https://landing{i}.example.org/ds/{m}</abcd:URI>" if has_uri else ""
    )
    units = []
    for j in range(n_units(i, m)):
        v = unit_values(i, m, j)
        units.append(
            "<abcd:Unit>"
            f"<abcd:UnitID>{v['unit_id']}</abcd:UnitID>"
            "<abcd:Gathering><abcd:SiteCoordinateSets><abcd:SiteCoordinates>"
            "<abcd:CoordinatesLatLong>"
            f"<abcd:LongitudeDecimal>{v['lon']}</abcd:LongitudeDecimal>"
            f"<abcd:LatitudeDecimal>{v['lat']}</abcd:LatitudeDecimal>"
            f"<abcd:SpatialDatum>{v['datum']}</abcd:SpatialDatum>"
            "</abcd:CoordinatesLatLong>"
            "</abcd:SiteCoordinates></abcd:SiteCoordinateSets></abcd:Gathering>"
            "</abcd:Unit>"
        )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<abcd:DataSets xmlns:abcd="http://www.tdwg.org/schemas/abcd/2.06">\n'
        "<abcd:DataSet>"
        "<abcd:TechnicalContacts><abcd:TechnicalContact>"
        f"<abcd:Name>contact {i}-{m}</abcd:Name>"
        "</abcd:TechnicalContact></abcd:TechnicalContacts>"
        "<abcd:Metadata><abcd:Description><abcd:Representation>"
        f"<abcd:Title>DATASET TITLE {i}-{m}</abcd:Title>"
        f"{uri}"
        "</abcd:Representation></abcd:Description></abcd:Metadata>"
        f"<abcd:Units>{''.join(units)}</abcd:Units>"
        "</abcd:DataSet>"
        "</abcd:DataSets>\n"
    )
    return xml.encode("utf-8")


def page_html(i: int) -> bytes:
    """ZIP archive of the page's member XMLs (deterministic bytes)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for m in range(n_members(i)):
            info = zipfile.ZipInfo(f"member_{m}.xml", date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(info, member_xml(i, m))
    return buf.getvalue()


def expected_text(i: int) -> str:
    """Expected byte-identical extraction for page i: the spec-ordered CSV unit
    rows of every parseable member (the reference's --file-to-csv body,
    src/main.rs:94-111; NULL→empty; Rust Display floats)."""
    rows = []
    for m in range(n_members(i)):
        if member_is_garbage(i, m):
            continue
        for j in range(n_units(i, m)):
            v = unit_values(i, m, j)
            lon = "" if v["lon"] == "N/A" else v["lon"]  # dropped numeric → NULL → empty
            # spec order: contact, title, uri (dataset-level: absent in unit
            # rows), unit_id, lon, lat, datum
            rows.append(",".join(["", "", "", v["unit_id"], lon, v["lat"], v["datum"]]))
    return "\n".join(rows) + ("\n" if rows else "")


def page_row(i: int, n_hosts: int) -> dict:
    return {
        "url": page_url(i, n_hosts),
        "warc_ts": warc_ts(i),
        "html": page_html(i),
        "text": expected_text(i),
        "lang": LANGS[i % len(LANGS)],
    }


# --------------------------------------------------------------------------
# frontier
# --------------------------------------------------------------------------

def variant_url(i: int, n_hosts: int) -> str | None:
    """A canonicalization-variant spelling of page i's url, or None."""
    h = host_of(i, n_hosts)
    base_path = f"/p/{i}"
    if i % 20 == 7:
        return f"https://HOST{h}.EXAMPLE.ORG{base_path}"
    if i % 20 == 13:
        return f"https://host{h}.example.org:443{base_path}"
    if i % 20 == 17:
        return f"https://host{h}.example.org{base_path}#frag"
    if i % 20 == 3:
        return f"https://host{h}.example.org/%70/{i}"  # %70 = 'p' (unreserved decode)
    if i % 20 == 9:
        return f"https://host{h}.example.org/x/../p/{i}"  # dot-segment removal
    return None


def is_unknown(i: int) -> bool:
    return i % 50 == 21


def unknown_url(i: int, n_hosts: int) -> str:
    return f"https://host{host_of(i, n_hosts)}.example.org/missing/{i}"


def frontier_rows(n_pages: int, n_hosts: int) -> list[dict]:
    rows = []
    for i in range(n_pages):
        url = unknown_url(i, n_hosts) if is_unknown(i) else page_url(i, n_hosts)
        h = host_of(i, n_hosts)
        rows.append(
            {
                "url": url,
                "host": f"host{h}.example.org",
                "priority": i % 4,
                "warc_ts": warc_ts(i),
                "provider": f"provider_{h % 7}",
                "discovered_round": 0,
                "retries": 0,
            }
        )
        v = variant_url(i, n_hosts)
        if v is not None and not is_unknown(i):
            rows.append(
                {
                    "url": v,
                    "host": f"host{h}.example.org",
                    "priority": (i + 1) % 4,
                    "warc_ts": warc_ts(i),
                    "provider": f"provider_{h % 7}",
                    "discovered_round": 0,
                    "retries": 0,
                }
            )
    return rows


def robots_rows(n_hosts: int) -> list[dict]:
    rows = []
    for h in range(n_hosts):
        rows.append(
            {
                "host": f"host{h}.example.org",
                "disallow_prefixes": ["/p/9"] if h % 10 == 3 else [],
                "crawl_delay_s": 1.0 + (h % 3),
                "max_per_round": 8 - 2 * (h % 3),
            }
        )
    return rows


def cache_rows(n_pages: int, n_hosts: int) -> list[dict]:
    """Recovery copies for half the unknown urls (i % 100 == 21)."""
    rows = []
    for i in range(n_pages):
        if is_unknown(i) and i % 100 == 21:
            r = page_row(i, n_hosts)
            r["url"] = unknown_url(i, n_hosts)
            rows.append(r)
    return rows


# --------------------------------------------------------------------------
# materialization
# --------------------------------------------------------------------------

def write_local(out_dir: str, n_pages: int, n_hosts: int) -> None:
    """Small-scale generation via pyarrow (tests); bench uses write_spark."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def to_table(rows: list[dict]) -> pa.Table:
        if not rows:
            return pa.table({})
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        return pa.table(cols)

    pages = [page_row(i, n_hosts) for i in range(n_pages)]
    pq.write_table(to_table(pages), out / "pages.parquet")
    pq.write_table(to_table(frontier_rows(n_pages, n_hosts)), out / "frontier.parquet")
    pq.write_table(to_table(robots_rows(n_hosts)), out / "robots.parquet")
    cr = cache_rows(n_pages, n_hosts)
    if cr:
        pq.write_table(to_table(cr), out / "cache.parquet")


def write_spark(spark, out_dir: str, n_pages: int, n_hosts: int, partitions: int = 64) -> None:
    """Bench-scale generation: spark.range → mapInPandas → parquet.

    Same per-id functions as write_local, so both paths produce identical rows.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from .schemas import PAGES

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = [page_row(int(i), n_hosts) for i in ids]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    (
        spark.range(0, n_pages, 1, partitions)
        .mapInPandas(gen, schema=PAGES)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/pages.parquet")
    )

    from .schemas import FRONTIER

    def gen_frontier(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                i = int(i)
                url = unknown_url(i, n_hosts) if is_unknown(i) else page_url(i, n_hosts)
                h = host_of(i, n_hosts)
                base = {
                    "host": f"host{h}.example.org",
                    "warc_ts": warc_ts(i),
                    "provider": f"provider_{h % 7}",
                    "discovered_round": 0,
                    "retries": 0,
                }
                rows.append({"url": url, "priority": i % 4, **base})
                v = variant_url(i, n_hosts)
                if v is not None and not is_unknown(i):
                    rows.append({"url": v, "priority": (i + 1) % 4, **base})
            yield pd.DataFrame(rows, columns=[f.name for f in FRONTIER.fields])

    import pandas as pd

    (
        spark.range(0, n_pages, 1, partitions)
        .mapInPandas(gen_frontier, schema=FRONTIER)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/frontier.parquet")
    )

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pathlib import Path

    out = Path(out_dir)

    def to_table(rows):
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        return pa.table(cols)

    pq.write_table(to_table(robots_rows(n_hosts)), out / "robots.parquet")
    cr = cache_rows(n_pages, n_hosts)
    if cr:
        pq.write_table(to_table(cr), out / "cache.parquet")
