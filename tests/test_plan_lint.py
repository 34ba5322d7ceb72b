"""plan_lint: the scale linter must flag known-bad shapes and pass the
engine's own bench plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ezbake_graph_spark import api, registry, tables
from ezbake_graph_spark.plan_lint import assert_scales, scale_lint
from tests.conftest import SF_SMOKE


def test_cartesian_product_is_an_error(spark):
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    # non-equi condition with no broadcast hint on a big-ish side can
    # plan a cartesian/nested-loop; force the worst case explicitly
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    df = a.crossJoin(b.hint("shuffle_replicate_nl"))
    rep = scale_lint(df)
    assert any(c == "cartesian" for _, c, _ in rep.findings)
    with pytest.raises(AssertionError, match="does not scale"):
        assert_scales(df)


def test_python_udf_is_a_warning(spark):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    df = spark.range(10).select(slow("id").alias("y"))
    rep = scale_lint(df)
    assert any(c == "python-udf" for _, c, _ in rep.findings)
    assert not rep.errors  # warn, not error
    assert_scales(df)  # passes the gate


def test_clean_map_side_plan_is_clean(spark):
    d = tables.load(spark, SF_SMOKE, "documents")
    rep = assert_scales(api.gopher_quality(d))
    assert not rep.findings or all(f[0] == "info" for f in rep.findings)


def test_every_bench_plan_passes_the_gate(spark):
    """The engine's own headline + tier-2 queries must pass their own
    linter — the strongest self-consistency check the linter offers."""
    qs = registry.queries()
    keys = sorted(
        k
        for k, s in registry.REGISTRY.items()
        if "bench" in s.tags or "bench2" in s.tags
    )
    for key in keys:
        assert_scales(qs[key](spark, SF_SMOKE))
