"""Every SQL-oracled key in the registry hash-matches DuckDB at sf0.001.

This is the same check the driver's t2 gate runs at sf0.01
(row count + schema + order-insensitive value hash), pinned into the
local suite so a regression in ANY registered operator fails fast.
"""

from __future__ import annotations

import pytest

from ezbake_graph_spark import registry
from tests.conftest import assert_query_matches_oracle

ALL_SQL_KEYS = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("key", ALL_SQL_KEYS)
def test_sql_key_matches_oracle(spark, duck, key):
    assert_query_matches_oracle(spark, duck, key)
