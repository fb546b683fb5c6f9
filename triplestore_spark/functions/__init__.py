from triplestore_spark.functions.keys import okey_expr, tkey_expr, with_keys
from triplestore_spark.functions.literals import (
    go_fmt_bool,
    go_fmt_float,
    go_fmt_int,
    go_fmt_datetime,
)

__all__ = [
    "okey_expr",
    "tkey_expr",
    "with_keys",
    "go_fmt_bool",
    "go_fmt_float",
    "go_fmt_int",
    "go_fmt_datetime",
]
