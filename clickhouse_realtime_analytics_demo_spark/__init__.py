"""PySpark-native real-time analytics engine.

A from-scratch re-expression of the capabilities of the reference demo
``doneyli/clickhouse-realtime-analytics-demo`` (a ClickHouse-backed
real-time analytics stack) as an idiomatic Apache Spark engine:

- batch analytics via the DataFrame/SQL API (Catalyst-optimized),
- incremental materialized views via Structured Streaming,
- scheduled (refreshable) analytics snapshots as batch jobs,
- broadcast-join "dictionaries", TTL retention, a query log,
- plus large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing).

Nothing here is ported code: the reference delegates all execution to a
ClickHouse server; this package re-implements the *capability surface*
(SURVEY.md section 2) on Spark primitives.
"""

__version__ = "0.1.0"
