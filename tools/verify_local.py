"""Local stand-in for the driver's correctness gate.

Runs every registered query (or the keys given on argv) at a scale
factor, runs its DuckDB oracle over the same parquet, and compares:
row count, sorted column names, and an order-insensitive value hash
over canonically stringified cells. Exit code = number of failures.

Usage:
    python tools/verify_local.py [--sf SF_DIR] [key ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
import traceback
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session
from ezbake_graph_spark.tables import TABLES


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, stringify cells, sort rows. Returns
    (sorted_col_names, sorted_row_strings)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append("\x01".join(canon_cell(row[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def value_hash(row_strs: list[str]) -> str:
    h = hashlib.sha256()
    for r in row_strs:
        h.update(r.encode("utf-8", "replace"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def spark_collect(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_collect(con, sql: str) -> tuple[list[str], list[tuple], list[str]]:
    """Fetch a DuckDB result plus a list of type-cleanliness problems.

    The driver may fetch oracle results via pandas or Arrow, where
    DuckDB's HUGEINT (e.g. from count_if / sum(int)) becomes float64 or
    decimal128 and stringifies as '2.0' / Decimal — mismatching Spark's
    plain int even when values are equal (CORRECTNESS_r01: agg_filtered,
    events_funnel_conversion). Oracles must therefore emit only
    BIGINT-or-narrower ints, DOUBLE, VARCHAR, BOOL, DATE, TIMESTAMP,
    and lists thereof.
    """
    # Relation API: DuckDB's own logical type names are available on the
    # lazy relation BEFORE execution (binder only), so one execution
    # serves both the type check and the row fetch. Using DuckDB types —
    # not the Arrow mapping — also catches HUGEINT on duckdb versions
    # that map it to float64, where the Arrow check can't tell it from a
    # legitimate DOUBLE.
    rel = con.sql(sql)
    cols = list(rel.columns)
    _dirty = ("HUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT", "FLOAT")
    dirty = [
        f"{c}:{t}"
        for c, t in zip(cols, (str(t).upper() for t in rel.types))
        if any(d in t for d in _dirty)
    ]
    rows = rel.fetchall()
    return cols, rows, dirty


# DecimalType / FloatType stringify differently across engines; nested
# types (array/map/struct) are unhashable in the driver's pandas
# canonicalizer (CORRECTNESS_r03: embed_quantize / embed_l2_normalize).
_SPARK_DIRTY = ("decimal", "float", "array<", "map<", "struct<")


def spark_dirty_cols(df) -> list[str]:
    out = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if any(t in s for t in _SPARK_DIRTY):
            out.append(f"{f.name}:{s}")
    return out


def _row(rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
    """One report entry, shaped exactly like a driver CORRECTNESS row."""
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("VERIFY_SF", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--json",
        default=None,
        help="write a machine-readable report in the driver's "
        "CORRECTNESS_rN.json row shape (VERDICT r8 #2: makes the "
        "local full-registry sweep an auditable committed artifact)",
    )
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    qs = registry.queries()
    oracles = registry.oracle_sql()
    keys = args.keys or sorted(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {unknown}")
        return 1

    spark = get_session("verify-local")
    con = duckdb_conn(args.sf)
    failures = 0
    report: dict[str, dict] = {}
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, args.sf)
            scols, srows = spark_collect(sdf)
        except Exception:
            print(f"FAIL  {k}: spark raised")
            traceback.print_exc()
            failures += 1
            report[k] = _row(None, None, None, None, None, "spark_raised")
            continue
        dt = time.time() - t0
        if k not in oracles:
            print(f"rows  {k}: {len(srows)} rows ({dt:.1f}s) [rows-only]")
            if len(srows) == 0 and "empty-ok" not in registry.REGISTRY[k].tags:
                print(f"WARN  {k}: 0 rows from rows-only query")
            report[k] = _row(None, None, None, len(srows), None, "no_oracle")
            continue
        try:
            dcols, drows, dirty = duck_collect(con, oracles[k])
        except Exception:
            print(f"FAIL  {k}: duckdb oracle raised")
            traceback.print_exc()
            failures += 1
            report[k] = _row(None, None, None, len(srows), None, "oracle_raised")
            continue
        sc, ss = canon_rows(scols, srows)
        dc, ds = canon_rows(dcols, drows)
        problems = []
        dirty += [f"spark {c}" for c in spark_dirty_cols(sdf)]
        if dirty:
            problems.append(f"type-unclean output cols (driver-fetch hazard): {dirty}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sc != dc:
            problems.append(f"schema spark={sc} duck={dc}")
        if not problems and value_hash(ss) != value_hash(ds):
            problems.append("value-hash mismatch")
            sset, dset = set(ss), set(ds)
            only_s = sorted(sset - dset)[:3]
            only_d = sorted(dset - sset)[:3]
            for r in only_s:
                problems.append(f"  spark-only: {r[:200]}")
            for r in only_d:
                problems.append(f"  duck-only:  {r[:200]}")
        hash_ok = value_hash(ss) == value_hash(ds)
        report[k] = _row(
            len(srows) == len(drows), sc == dc, hash_ok,
            len(srows), len(drows), None,
        )
        if problems:
            failures += 1
            print(f"FAIL  {k} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
        else:
            print(f"ok    {k}: {len(srows)} rows ({dt:.1f}s)")
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"report written: {args.json}")
    return failures


if __name__ == "__main__":
    sys.exit(main())
