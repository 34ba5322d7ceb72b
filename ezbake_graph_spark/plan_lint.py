"""Scale linter: read a DataFrame's physical plan and flag the
patterns that break at 100 TB before the job ever runs.

``scale_lint(df)`` returns a structured report — plan-shape counters
plus a list of findings, each ``(severity, code, message)`` — and
``assert_scales(df)`` raises on any ``error`` finding, which makes the
linter usable as a CI gate for user pipelines built on this engine
(tests/test_plans.py pins this package's own bench plans the same
way).

What it checks (each rule is a pattern with a known 100 TB failure
mode):

- ``cartesian``      error: CartesianProduct / unbroadcast
  NestedLoopJoin — O(n x m) pairs; always a rewrite (keyed join,
  banding, grid kernel).
- ``python-udf``     warn: row-at-a-time BatchEvalPython — every row
  crosses the JVM/Python boundary unvectorized; use built-in
  expressions or Arrow-batched pandas UDFs.
- ``single-part``    warn: a 1-partition Exchange (rangepartitioning(1)
  or SinglePartition) under further computation — a serial stage on
  the whole dataset. (A closing coalesce(1) over a dimension-bounded
  result is the legitimate exception; the rule only fires when more
  operators execute above it.)
- ``many-shuffles``  info: > 3 exchanges — often fine (agg + join +
  sort), but worth a look for a re-usable partitioning.
- ``no-pushdown``    info: a parquet scan whose PushedFilters is empty
  while the plan filters above it — the filter didn't reach the scan
  (cast/udf in the predicate is the usual cause).

The linter reads only the EXECUTED/analyzed plan string — no execution
is triggered (``df.queryExecution().executedPlan`` compiles the plan
lazily without running jobs, modulo AQE which finalizes at run time;
pre-run plans are linted in their initial shape).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class LintReport:
    counters: dict
    findings: list = field(default_factory=list)

    @property
    def errors(self) -> list:
        return [f for f in self.findings if f[0] == "error"]

    def __str__(self) -> str:  # human-readable, one finding per line
        lines = [f"plan: {self.counters}"]
        lines += [f"{sev:5s} [{code}] {msg}" for sev, code, msg in self.findings]
        return "\n".join(lines) if self.findings else lines[0] + "\nclean"


def exchange_parent(plan: str, pos: int) -> str | None:
    """The nearest real operator line ABOVE the node starting at text
    offset ``pos`` — skipping the node's own line and AQE bookkeeping
    wrappers (ShuffleQueryStage / AQEShuffleRead / reuse markers) that
    print between an Exchange and its logical parent."""
    lines = [
        ln
        for ln in plan[:pos].rsplit("\n", 1)[0].splitlines()
        if ln.strip()
    ]
    skip = re.compile(
        r"(ShuffleQueryStage|BroadcastQueryStage|TableCacheQueryStage|"
        r"AQEShuffleRead|ReusedExchange|ReusedSubquery)"
    )
    for ln in reversed(lines):
        if not skip.search(ln):
            return ln
    return None


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scale_lint(df: DataFrame) -> LintReport:
    """Lint a DataFrame's physical plan for scale anti-patterns.

    Returns a ``LintReport`` with ``counters`` (exchanges, broadcasts,
    join strategies, codegen spans) and ``findings`` as
    ``(severity, code, message)`` tuples, severities ``error`` >
    ``warn`` > ``info``.
    """
    plan = _plan_text(df).split("== Initial Plan ==")[0]

    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    counters = {
        "exchanges": count(r"Exchange hashpartitioning")
        + count(r"Exchange rangepartitioning")
        + count(r"Exchange SinglePartition"),
        "broadcasts": count(r"BroadcastHashJoin"),
        "smj": count(r"SortMergeJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }
    findings: list = []

    if "CartesianProduct" in plan:
        findings.append(
            (
                "error",
                "cartesian",
                "CartesianProduct: O(n*m) pair explosion — rewrite as a keyed "
                "join, banded/blocked candidates, or a bounded grid kernel",
            )
        )
    if re.search(r"BroadcastNestedLoopJoin (?!BuildLeft|BuildRight)", plan) or (
        "NestedLoopJoin" in plan and "Broadcast" not in plan
    ):
        findings.append(
            (
                "error",
                "nested-loop",
                "unbroadcast NestedLoopJoin: quadratic comparisons without "
                "even a broadcast bound",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            (
                "warn",
                "python-udf",
                "row-at-a-time Python UDF (BatchEvalPython): 10-100x slower "
                "than built-in expressions or Arrow-batched pandas UDFs",
            )
        )
    # a serial stage: single-partition exchange with real operators
    # above. Exception (r12): an exchange whose DIRECT PARENT is a
    # grouping-free final HashAggregate is the 1-row broadcast-total
    # closing (each upstream partition contributes one partial row, so
    # the serial stage sees partition-count rows, never data) — the
    # shape every scalar-total crossJoin key plans; flagging it buried
    # the real data-proportional findings in false positives.
    m = None
    for cand in re.finditer(
        r"Exchange (?:SinglePartition|rangepartitioning\([^,]+, 1\))", plan
    ):
        parent = exchange_parent(plan, cand.start())
        if parent is not None and re.search(r"HashAggregate\(keys=\[\]", parent):
            continue
        m = cand
        break
    if m:
        above = plan[: m.start()]
        # count plan operators above the serial exchange, ignoring the
        # benign closing shapes (project/sort/agg-over-bounded-result)
        heavy_above = re.findall(
            r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|HashAggregate|"
            r"Window|Generate)\b",
            above,
        )
        if heavy_above:
            findings.append(
                (
                    "warn",
                    "single-part",
                    f"single-partition exchange feeds {len(heavy_above)} "
                    "downstream operator(s) — a serial stage over the whole "
                    "dataset; keep coalesce(1) for dimension-bounded closings "
                    "only",
                )
            )
    if counters["exchanges"] > 3:
        findings.append(
            (
                "info",
                "many-shuffles",
                f"{counters['exchanges']} exchanges — check whether one "
                "partitioning can be reused across stages (bucketing, "
                "repartition before multi-use)",
            )
        )
    empty_scans = len(re.findall(r"PushedFilters: \[\]", plan))
    if empty_scans and re.search(r"\bFilter\b", plan):
        findings.append(
            (
                "info",
                "no-pushdown",
                f"{empty_scans} parquet scan(s) with empty PushedFilters under "
                "a Filter — the predicate didn't reach the scan (cast or UDF "
                "in the predicate is the usual cause)",
            )
        )
    return LintReport(counters=counters, findings=findings)


def assert_scales(df: DataFrame) -> LintReport:
    """CI-gate form: lint and raise ``AssertionError`` listing every
    ``error``-severity finding (quadratic shapes); warnings and infos
    pass through in the returned report."""
    report = scale_lint(df)
    if report.errors:
        msgs = "; ".join(f"[{c}] {m}" for _, c, m in report.errors)
        raise AssertionError(f"plan does not scale: {msgs}")
    return report
