"""Validated ad-hoc SQL gateway.

Mirrors the reference's read-only query endpoint
(app_interactive.py:256-304: allowlist prefix check :269-271, dangerous
keyword blocklist :274-276, wall-clock timing :279-281) and the NL->SQL
safety gate (chat_service.py:126-143).  Differences, on purpose:

- keyword blocking is word-boundary-based (the reference's substring
  check would reject a column named ``created_at`` — SURVEY.md §2.2
  P11 flags the reference's string handling as a wart to fix, not
  replicate);
- the query string is run through the ClickHouse->Spark dialect shim
  (plans/dialect.py) before ``spark.sql``, so queries written for the
  reference run unchanged.

Scale: validation is O(len(sql)) on the driver; execution is whatever
plan Catalyst picks — the gateway adds zero overhead to the cluster
path.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from clickhouse_realtime_analytics_demo_spark.plans import dialect

__all__ = ["GatewayResult", "execute", "validate"]

# app_interactive.py:269-271 allows SELECT/SHOW/DESCRIBE; we add the
# read-only WITH (CTE), EXPLAIN and VALUES forms Spark supports.
_ALLOWED_PREFIXES = ("SELECT", "WITH", "SHOW", "DESCRIBE", "DESC", "EXPLAIN", "TABLE")

# app_interactive.py:274-276 blocklist, extended with Spark DDL verbs.
_BLOCKED = (
    "INSERT",
    "UPDATE",
    "DELETE",
    "DROP",
    "CREATE",
    "ALTER",
    "TRUNCATE",
    "REPLACE",
    "MERGE",
    "GRANT",
    "REVOKE",
    "ATTACH",
    "DETACH",
    "RENAME",
    "OPTIMIZE",
    "KILL",
    "SET",
    "RESET",
    "ADD",
    "REFRESH",
)

_BLOCKED_RE = re.compile(r"\b(" + "|".join(_BLOCKED) + r")\b", re.IGNORECASE)
_STRING_OR_COMMENT = re.compile(r"'(?:[^'\\]|\\.|'')*'|--[^\n]*|/\*.*?\*/", re.DOTALL)


class QueryRejected(ValueError):
    """Raised when a statement fails the read-only validation gate."""


def validate(sql: str) -> None:
    stripped = sql.strip()
    if not stripped:
        raise QueryRejected("empty query")
    # blank out literals/comments first so a ';' or keyword inside a
    # string literal or SQL comment doesn't trip the checks
    code_only = _STRING_OR_COMMENT.sub(" ", stripped)
    if ";" in code_only.rstrip().rstrip(";"):
        raise QueryRejected("multiple statements are not allowed")
    first_word = stripped.split(None, 1)[0].upper().rstrip(";")
    if first_word not in _ALLOWED_PREFIXES:
        raise QueryRejected(
            f"only read-only statements are allowed (got {first_word!r}); "
            f"permitted prefixes: {', '.join(_ALLOWED_PREFIXES)}"
        )
    m = _BLOCKED_RE.search(code_only)
    if m:
        raise QueryRejected(f"blocked keyword: {m.group(1).upper()}")


@dataclass(frozen=True)
class GatewayResult:
    df: DataFrame
    rewritten_sql: str
    plan_seconds: float  # driver-side parse/analyze time, app_interactive.py:279-281 analog


def execute(spark: SparkSession, sql: str, *, rewrite: bool = True) -> GatewayResult:
    """Validate, (optionally) dialect-rewrite, and plan a query.

    Returns the lazy DataFrame — callers decide whether to collect,
    exactly like the reference returns rows to Flask for JSON-ification
    (app_interactive.py:283-300).
    """
    validate(sql)
    final_sql = dialect.rewrite(sql) if rewrite else sql
    t0 = time.perf_counter()
    df = spark.sql(final_sql)
    return GatewayResult(df=df, rewritten_sql=final_sql, plan_seconds=time.perf_counter() - t0)
