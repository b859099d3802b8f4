"""Bit-compatible re-implementations of the Rust primitives the reference's
output bytes depend on.

* ``parse_f64`` — Rust ``str::parse::<f64>()`` acceptance grammar
  (used at /root/reference/src/abcd/abcd_parser.rs:110-114: numeric fields are
  parsed, failure ⇒ silently dropped / NULL).  Python's ``float()`` is laxer
  (accepts ``1_000``, surrounding whitespace, ``infinity`` spelled out is also
  accepted by Rust) so acceptance is gated by a regex of the Rust grammar.
* ``f64_display`` — Rust ``{}`` Display for f64
  (/root/reference/src/vat_type.rs:35-42): shortest round-trip digits, never
  exponent notation, integral values without ``.0`` (``42.0 → "42"``).
"""

from __future__ import annotations

import re
from decimal import Decimal

# Rust f64 FromStr grammar (core/src/num/dec2flt): optional sign; 'inf',
# 'infinity', 'nan' case-insensitive; else decimal digits with optional
# fraction and exponent. No underscores, no surrounding whitespace, no hex.
_RUST_F64 = re.compile(
    r"""^[+-]?(
        inf(inity)? | nan |
        ( \d+\.?\d* | \.\d+ | \d+\. ) ( [eE][+-]?\d+ )?
    )$""",
    re.IGNORECASE | re.VERBOSE,
)


def parse_f64(s: str) -> float | None:
    """Rust ``s.parse::<f64>()``: the float value, or None on failure."""
    if not _RUST_F64.match(s):
        return None
    try:
        return float(s)
    except ValueError:  # pragma: no cover - grammar already guards
        return None


def f64_display(x: float) -> str:
    """Rust ``format!("{}", x)`` for f64."""
    if x != x:  # NaN
        return "NaN"
    if x == float("inf"):
        return "inf"
    if x == float("-inf"):
        return "-inf"
    r = repr(x)  # shortest round-trip digits (same contract as Rust's Grisu/Ryu)
    if "e" in r or "E" in r:
        # expand scientific notation to plain decimal, Rust-style
        d = Decimal(r)
        r = format(d, "f")
    if r.endswith(".0"):
        r = r[:-2]
    if r == "-0":
        return "-0"
    return r
