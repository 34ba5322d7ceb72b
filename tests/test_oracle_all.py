"""Every SQL-oracled key in the registry hash-matches DuckDB at sf0.001.

This is the same check the driver's t2 gate runs at sf0.01
(row count + schema + order-insensitive value hash), pinned into the
local suite so a regression in ANY registered operator fails fast.
"""

from __future__ import annotations

import pytest

from ezbake_graph_spark import registry
from tests.conftest import SF_SMOKE, assert_query_matches_oracle

ALL_SQL_KEYS = sorted(registry.oracle_sql().keys())

ROWS_ONLY_KEYS = sorted(set(registry.queries()) - set(ALL_SQL_KEYS))


@pytest.mark.parametrize("key", ALL_SQL_KEYS)
def test_sql_key_matches_oracle(spark, duck, key):
    assert_query_matches_oracle(spark, duck, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_key_schema_is_driver_safe(spark, key):
    """The driver canonicalizes EVERY emitted result — rows-only keys
    included — through a pandas sort that raises ``TypeError:
    unhashable type: 'list'`` on array/map/struct cells (the
    CORRECTNESS_r09 ``embed_pca`` hard-error record, the only one in
    nine rounds). Oracled keys get this check inside
    ``assert_query_matches_oracle`` on every sweep; this closes the
    same class for the 24 rows-only keys so no future key reopens it.
    Schema-only: the DataFrame is built (which may run plan-build
    jobs for iterative keys) but never collected."""
    df = registry.queries()[key](spark, SF_SMOKE)
    nested = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.simpleString().startswith(("array<", "map<", "struct<"))
    ]
    assert not nested, (
        f"{key}: array/map/struct output cols crash the driver "
        f"canonicalizer — flatten or serialize them: {nested}"
    )
