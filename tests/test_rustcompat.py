"""Rust f64 parse/Display parity (reference: src/vat_type.rs:35-42 Display;
numeric try-parse at src/abcd/abcd_parser.rs:110-114)."""

from crawlspark.rustcompat import f64_display, parse_f64


def test_parse_accepts_rust_grammar():
    assert parse_f64("42") == 42.0
    assert parse_f64("42.0") == 42.0
    assert parse_f64("-3.5e2") == -350.0
    assert parse_f64(".5") == 0.5
    assert parse_f64("5.") == 5.0
    assert parse_f64("+1") == 1.0
    assert parse_f64("inf") == float("inf")
    assert parse_f64("NaN") != parse_f64("NaN")  # NaN


def test_parse_rejects_python_extras():
    # Python float() accepts these; Rust parse::<f64>() does not
    assert parse_f64("1_000") is None
    assert parse_f64(" 42") is None
    assert parse_f64("42 ") is None
    assert parse_f64("0x10") is None
    assert parse_f64("") is None
    assert parse_f64("N/A") is None


def test_display_matches_rust():
    # golden cases of Rust `{}` Display for f64
    assert f64_display(42.0) == "42"           # vat_type.rs Display drops .0
    assert f64_display(49.911) == "49.911"
    assert f64_display(-0.0) == "-0"
    assert f64_display(0.1) == "0.1"
    assert f64_display(1e21) == "1000000000000000000000"   # no exponent ever
    assert f64_display(1e-7) == "0.0000001"
    assert f64_display(float("inf")) == "inf"
    assert f64_display(float("-inf")) == "-inf"
    assert f64_display(float("nan")) == "NaN"
    assert f64_display(10.101) == "10.101"


def test_display_roundtrip_shortest():
    for s in ["47.123", "10.911", "-40.101", "0.103", "89.999"]:
        assert f64_display(float(s)) == s
