"""Perturbed ~sf1 dedup/ER tier artifact (VERDICT r11 ask #2).

BENCH_X10.json runs the VERBATIM-copy x10 fixture, where every record
has an exact twin in each of the 10 copies and the dedup/ER pair
output carries a copies^2 artifact (~100x) — the 1 614 s minhash
reading there grades fixture replication as much as plan cost. The
content-perturbed fixture (tools/scale_curve.py --perturb, SCALE.md
§23) forces cross-copy similarity below every threshold, so TRUE pair
output grows ~linearly with copies and wall time finally reads plan
cost at ~sf1 scale.

Protocol = the committed x10 protocol: per scale, one untimed warm
execution per key (JIT/codegen compiles for the x10-shaped plans),
then one timed execution (BENCH_RUNS2=1, BENCH_WARMUP_T2=1);
``dedup_minhash`` materializes via noop sink (its pair table is a
dataset, never a driver fetch); headline keys disabled. After the
bench, each key's OUTPUT ROW COUNT is recorded at both scales — the
linearity denominator that turns "wall grew k x" into "wall grew k x
for k x output".

Usage: python tools/x10_perturbed.py [--out BENCH_X10_PERTURBED.json]
(run on a quiet machine; the bench subprocesses gate on loadavg).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_curve import SRC, materialize, run_bench

TIER_KEYS = [
    "curate_corpus",
    "dedup_cut_spans",
    "dedup_minhash",
    "dedup_resolve_entities",
    "dedup_semdedup",
]
SINK_KEYS = ["dedup_minhash"]


def output_rows(sf_dir: str) -> dict[str, int]:
    """One count job per key — the linear-output denominator. Runs in
    THIS process (after the timed subprocesses exit) on a fresh
    session; counts never touch the committed timings."""
    from ezbake_graph_spark import registry
    from ezbake_graph_spark.session import get_session

    spark = get_session("x10-perturbed-rows")
    qs = registry.queries()
    out = {}
    for k in TIER_KEYS:
        t0 = time.time()
        out[k] = qs[k](spark, sf_dir).count()
        print(f"# rows {k}@{sf_dir}: {out[k]} ({time.time() - t0:.0f}s)", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_X10_PERTURBED.json")
    ap.add_argument("--skip-rows", action="store_true")
    args = ap.parse_args()

    os.environ.update(
        BENCH_KEYS="none",
        BENCH_T2_KEYS=",".join(TIER_KEYS),
        BENCH_SINK_KEYS=",".join(SINK_KEYS),
        BENCH_RUNS2="1",
        BENCH_WARMUP_T2="1",
        EZGS_BENCH_TIMEOUT="14400",
    )
    x10_dir = materialize(10, perturb=True)  # gate-neutrality asserted inside
    results, rows = {}, {}
    for label, sf_dir in (("x1", SRC), ("x10", x10_dir)):
        print(f"# benching {label} at {sf_dir}", file=sys.stderr)
        results[label] = run_bench(sf_dir, runs=1)
    if not args.skip_rows:
        for label, sf_dir in (("x1", SRC), ("x10", x10_dir)):
            rows[label] = output_rows(sf_dir)
    t1, t10 = results["x1"]["tier2_queries"], results["x10"]["tier2_queries"]
    artifact = {
        "metric": "x10_perturbed_tier2_warm",
        "sf_dir": x10_dir,
        "scale_note": (
            "10 key-offset copies of sf0.1 (~sf1) with the SCALE.md §23 "
            "content perturbation: per-copy token-bijective text prefix + "
            "3-char name suffix, gate-neutral (asserted at materialization), "
            "cross-copy similarity below every dedup/ER threshold — TRUE "
            "pair output is ~linear in copies, so wall time reads plan "
            "cost, not the verbatim fixture's copies^2 artifact "
            "(BENCH_X10.json)."
        ),
        "queries_x1": t1,
        "queries_x10": t10,
        "wall_ratio": {
            k: round(t10[k] / t1[k], 2) for k in t1 if t1.get(k)
        },
        "output_rows_x1": rows.get("x1", {}),
        "output_rows_x10": rows.get("x10", {}),
        "output_ratio": {
            k: round(rows["x10"][k] / rows["x1"][k], 3)
            for k in rows.get("x1", {})
            if rows["x1"][k]
        }
        if rows
        else {},
        "sink_keys": SINK_KEYS,
        "protocol": (
            "bench.py tier-2 semantics per scale: one untimed warm "
            "execution per key, then one timed (BENCH_RUNS2=1); "
            "dedup_minhash via noop sink; headline keys disabled; "
            "load-gated per bench.py. Output rows counted in a separate "
            "session after the timed subprocess exits."
        ),
        "load_gate_x1": results["x1"].get("load_gate_tier2"),
        "load_gate_x10": results["x10"].get("load_gate_tier2"),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"written": args.out, "wall_ratio": artifact["wall_ratio"]}))


if __name__ == "__main__":
    main()
