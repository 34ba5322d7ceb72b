"""Operator modules — importing this package registers every query.

Each module maps one SURVEY.md §2 section onto idiomatic Spark
DataFrame plans plus a DuckDB oracle twin. Keep this import list in
sync as modules are added.
"""

from ezbake_graph_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    geo,
    graph,
    joins,
    llm_chunk,
    llm_curate,
    llm_dedup,
    llm_filter,
    llm_similarity,
    llm_text,
    llm_tokenize,
    llm_url,
    multimodal,
    projection,
    quality,
    sampling,
    scalars,
    scans,
    setops,
    streaming,
    subqueries,
    timeseries,
    udfs,
    windows,
)
