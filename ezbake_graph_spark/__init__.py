"""ezbake_graph_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the ``ezbake/ezbake-graph`` reference
(property-graph store; see SURVEY.md §1). The reference tree at
/root/reference is empty (SURVEY.md §0), so the normative contract is
SURVEY.md §2's operator inventory: relational core, window/streaming
semantics, DataFrame-native Pregel graph analytics, and LLM-data-
pipeline extensions (dedup, similarity search, multimodal, text
analysis) — all designed for 100 TB scale via Catalyst/AQE, broadcast
joins, partial aggregation, and keyed (never cross) shuffles.
"""

from ezbake_graph_spark.session import get_session
from ezbake_graph_spark.registry import REGISTRY, register, queries, oracle_sql
from ezbake_graph_spark import api
from ezbake_graph_spark.plan_lint import assert_scales, scale_lint

__all__ = [
    "get_session",
    "REGISTRY",
    "register",
    "queries",
    "oracle_sql",
    "api",
    "scale_lint",
    "assert_scales",
]
__version__ = "0.1.0"
