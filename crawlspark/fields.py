"""Extraction field specification + sha1 physical column naming.

Reference semantics reproduced:

* field spec JSON records ``{name, numeric, vatMandatory, gfbioMandatory,
  globalField, unit}`` — /root/reference/src/abcd/abcd_fields.rs:11-20; lookup
  keyed by the slash path — abcd_fields.rs:40-50.
* physical column name = 40-char lowercase sha1 hex of the field path (paths
  exceed identifier limits) — /root/reference/src/storage/field.rs:11-30;
  golden value test field.rs:55-59.
* dataset vs unit column split on the ``globalField`` flag —
  /root/reference/src/storage/database_sink.rs:73-88.
* the (name, hash) translation dimension table —
  /root/reference/src/storage/database_sink.rs:104-125.

Unlike the reference's HashMap (nondeterministic iteration), field order here
is the JSON file order — deterministic, used for CSV headers.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path


def sha1_hex(name: str) -> str:
    """Physical column name for a field path (src/storage/field.rs:19-30)."""
    return hashlib.sha1(name.encode("utf-8")).hexdigest()


@dataclass(frozen=True)
class FieldSpec:
    name: str
    numeric: bool
    vat_mandatory: bool
    gfbio_mandatory: bool
    global_field: bool
    unit: str

    @property
    def hash(self) -> str:
        return sha1_hex(self.name)


class AbcdFields:
    """Ordered field specification (reference: src/abcd/abcd_fields.rs:24-68)."""

    def __init__(self, fields: list[FieldSpec]):
        self._fields = fields
        self._by_name = {f.name: f for f in fields}
        self._byte_whitelist: dict | None = None

    @property
    def byte_whitelist(self) -> dict:
        """{encoded name: spec}, built lazily ONCE per instance — the parse
        loop runs per ZIP member, and rebuilding this dict (encoding every
        field name) per call was measurable hot-path waste."""
        if self._byte_whitelist is None:
            self._byte_whitelist = {f.name.encode(): f for f in self._fields}
        return self._byte_whitelist

    @classmethod
    def from_path(cls, path: str | Path) -> "AbcdFields":
        with open(path, "rb") as f:
            raw = json.load(f)
        return cls.from_list(raw)

    @classmethod
    def from_list(cls, raw: list[dict]) -> "AbcdFields":
        return cls(
            [
                FieldSpec(
                    name=r["name"],
                    numeric=bool(r["numeric"]),
                    vat_mandatory=bool(r["vatMandatory"]),
                    gfbio_mandatory=bool(r["gfbioMandatory"]),
                    global_field=bool(r["globalField"]),
                    unit=r.get("unit", ""),
                )
                for r in raw
            ]
        )

    def value_of(self, name: str) -> FieldSpec | None:
        return self._by_name.get(name)

    def __iter__(self):
        return iter(self._fields)

    def __len__(self) -> int:
        return len(self._fields)

    @property
    def names(self) -> list[str]:
        return [f.name for f in self._fields]

    def split(self) -> tuple[list[FieldSpec], list[FieldSpec]]:
        """(dataset_fields, unit_fields) on globalField
        (src/storage/database_sink.rs:73-88)."""
        ds = [f for f in self._fields if f.global_field]
        un = [f for f in self._fields if not f.global_field]
        return ds, un

    def translation_rows(self) -> list[tuple[str, str]]:
        """(name, hash) rows of the translation dimension table
        (src/storage/database_sink.rs:104-125)."""
        return [(f.name, f.hash) for f in self._fields]
