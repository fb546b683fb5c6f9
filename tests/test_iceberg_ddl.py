"""Lock the Iceberg DDL to the parquet-emulation layouts — the two
backends must stay interchangeable (a config change, not a code
change). Pure string tests; no Spark session needed."""

import re

from triplestore_spark import schema as S
from triplestore_spark.operators.iceberg import (
    BUCKET_KEYS,
    create_layout_tables_sql,
)
from triplestore_spark.operators.materialize import LAYOUTS


def test_ddl_columns_are_component_fields_only():
    for ddl in create_layout_tables_sql():
        for derived in ("okey", "tkey"):
            assert not re.search(rf"\b{derived}\b", ddl), (
                f"derived column {derived} leaked into DDL: {ddl}"
            )
        for name in S.TRIPLE_FIELDS:
            assert name in ddl


def test_ddl_sort_order_matches_layouts():
    ddls = {re.search(r"triples_(\w+) ", d).group(1): d
            for d in create_layout_tables_sql()}
    assert set(ddls) == set(LAYOUTS)
    for layout, keys in LAYOUTS.items():
        m = re.search(r"'sort-order'='([^']*)'", ddls[layout])
        assert m and m.group(1) == ", ".join(keys)


def test_ddl_bucket_key_is_stored_column():
    ddls = {re.search(r"triples_(\w+) ", d).group(1): d
            for d in create_layout_tables_sql(partitions=512)}
    for layout, ddl in ddls.items():
        key = BUCKET_KEYS[layout]
        assert key in S.TRIPLE_FIELDS
        assert f"bucket(512, {key})" in ddl
        # bucket key must be part of the layout's sort spec so bucket
        # pruning and file skipping compose
        assert key in LAYOUTS[layout]
