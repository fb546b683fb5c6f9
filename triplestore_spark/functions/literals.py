"""Lexical-form producers with Go formatting parity.

The reference stores every literal as its Go lexical string form
(reference rdf.go:21-25); identity is string identity, so our lexical
producers must match Go byte-for-byte:

- bools: `fmt.Sprint(bool)` -> "true"/"false" (reference dsl.go:176-181)
- ints:  `fmt.Sprint(int)` -> decimal (reference dsl.go:204-209)
- floats: `fmt.Sprint(floatN)` == strconv.FormatFloat(v,'g',-1,N):
  shortest round-tripping digits, switching to exponent form when the
  decimal exponent is < -4 or >= 6, exponent printed sign + >=2 digits
  (reference dsl.go:392-397, dsl.go:420-425)
- datetime: `time.UTC().MarshalText()` == RFC3339Nano: UTC 'Z' suffix,
  fractional seconds trimmed of trailing zeros, omitted when zero
  (reference dsl.go:496-506)
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from decimal import Decimal


def go_fmt_bool(v: bool) -> str:
    return "true" if v else "false"


def go_fmt_int(v: int) -> str:
    return str(int(v))


def _shortest_decimal(v: float, bits: int) -> Decimal:
    """Shortest decimal digits that round-trip at the given width."""
    if bits == 32:
        import numpy as np

        s = np.format_float_positional(
            np.float32(v), unique=True, trim="-"
        )
        return Decimal(s)
    return Decimal(repr(float(v)))


def go_fmt_float(v: float, bits: int = 64) -> str:
    """strconv.FormatFloat(v, 'g', -1, bits) semantics."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    d = _shortest_decimal(v, bits)
    sign, digits, exp = d.as_tuple()
    # strip trailing zeros from the digit string (keep at least one)
    while len(digits) > 1 and digits[-1] == 0:
        digits = digits[:-1]
        exp += 1
    if digits == (0,):
        return "-0" if sign else "0"
    ds = "".join(str(x) for x in digits)
    dp = len(digits) + exp  # decimal point position
    e10 = dp - 1
    prefix = "-" if sign else ""
    # Go 'g' shortest: %e iff exp < -4 || exp >= 6 (strconv eprec=6)
    if e10 < -4 or e10 >= 6:
        mant = ds[0] + ("." + ds[1:] if len(ds) > 1 else "")
        return f"{prefix}{mant}e{e10:+03d}"
    if dp <= 0:
        return prefix + "0." + "0" * (-dp) + ds
    if dp >= len(ds):
        return prefix + ds + "0" * (dp - len(ds))
    return prefix + ds[:dp] + "." + ds[dp:]


def go_fmt_datetime(dt: datetime) -> str:
    """RFC3339Nano in UTC; naive datetimes are treated as UTC."""
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        frac = f".{dt.microsecond:06d}".rstrip("0")
        return f"{base}{frac}Z"
    return f"{base}Z"


def xsd_namespaced(tag: str) -> str:
    """`xsd:T` -> `http://www.w3.org/2001/XMLSchema#T`
    (reference types.go:37-44: any `a:b` two-part tag expands)."""
    splits = tag.split(":")
    if len(splits) != 2:
        return tag
    from triplestore_spark.schema import XML_SCHEMA_NAMESPACE

    return f"{XML_SCHEMA_NAMESPACE}#{splits[1]}"
