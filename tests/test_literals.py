"""Go lexical-form parity for literal producers (reference dsl.go)."""

from datetime import datetime, timezone

import pytest

from triplestore_spark.dsl import (
    lit_bool,
    lit_datetime,
    lit_float32,
    lit_float64,
    lit_int,
    object_literal,
    parse_literal,
    parse_typed,
)
from triplestore_spark.functions.literals import (
    go_fmt_datetime,
    go_fmt_float,
    xsd_namespaced,
)


# fmt.Sprint(float64) == strconv.FormatFloat(v,'g',-1,64) goldens,
# verified against Go's documented %g shortest behavior
FLOAT64_GOLDENS = [
    (0.0, "0"),
    (1.0, "1"),
    (-1.5, "-1.5"),
    (2.5, "2.5"),
    (100000.0, "100000"),
    (999999.0, "999999"),
    (1000000.0, "1e+06"),
    (1234567.0, "1.234567e+06"),
    (0.0001, "0.0001"),
    (0.00001, "1e-05"),
    (-0.00001, "-1e-05"),
    (123456.789, "123456.789"),
    (1e21, "1e+21"),
    (1e100, "1e+100"),
    (3.141592653589793, "3.141592653589793"),
    (2.2250738585072014e-308, "2.2250738585072014e-308"),
    (42.0, "42"),
]


@pytest.mark.parametrize("value,expected", FLOAT64_GOLDENS)
def test_go_fmt_float64(value, expected):
    assert go_fmt_float(value, 64) == expected


FLOAT32_GOLDENS = [
    (1.0, "1"),
    (2.5, "2.5"),
    (0.1, "0.1"),  # float32(0.1) shortest repr is 0.1
    (3.1415927, "3.1415927"),
    (1000000.0, "1e+06"),
]


@pytest.mark.parametrize("value,expected", FLOAT32_GOLDENS)
def test_go_fmt_float32(value, expected):
    assert go_fmt_float(value, 32) == expected


def test_datetime_golden():
    # golden from reference codec_test.go:304-311:
    # time.Unix(1233456789, 0).UTC() -> "2009-02-01T02:53:09Z"
    dt = datetime.fromtimestamp(1233456789, tz=timezone.utc)
    assert go_fmt_datetime(dt) == "2009-02-01T02:53:09Z"


def test_datetime_fractional_trimmed():
    dt = datetime(2020, 1, 2, 3, 4, 5, 120000, tzinfo=timezone.utc)
    assert go_fmt_datetime(dt) == "2020-01-02T03:04:05.12Z"
    dt0 = datetime(2020, 1, 2, 3, 4, 5, 0, tzinfo=timezone.utc)
    assert go_fmt_datetime(dt0) == "2020-01-02T03:04:05Z"


def test_object_literal_dispatch():
    assert object_literal(True).okey() == '"true"^^<xsd:boolean>'
    assert object_literal(42).okey() == '"42"^^<xsd:integer>'
    assert object_literal("x").okey() == '"x"^^<xsd:string>'
    assert object_literal(1.5).okey() == '"1.5"^^<xsd:double>'


def test_parse_literal_roundtrip():
    assert parse_literal(lit_bool(True)) is True
    assert parse_literal(lit_int(-7)) == -7
    assert parse_literal(lit_float64(2.5)) == 2.5
    assert parse_literal(lit_float32(2.5)) == 2.5
    dt = datetime(2009, 2, 1, 2, 53, 9, tzinfo=timezone.utc)
    assert parse_literal(lit_datetime(dt)) == dt


def test_parse_typed_strict():
    # 'literal is not an X but Y' (reference dsl.go:192-202)
    with pytest.raises(ValueError, match="literal is not an"):
        parse_typed(lit_int(1), "xsd:boolean")


def test_xsd_namespaced():
    assert (
        xsd_namespaced("xsd:integer")
        == "http://www.w3.org/2001/XMLSchema#integer"
    )
    assert xsd_namespaced("plain") == "plain"
