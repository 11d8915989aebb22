"""Query registry package — see ``registry.all_queries()``."""

from clickhouse_realtime_analytics_demo_spark.queries.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]
