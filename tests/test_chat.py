"""NL->SQL chat: extraction, safety gate, dialect rewrite on the LLM
output, and the /api/chat endpoint contract (pluggable LLM)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from clickhouse_realtime_analytics_demo_spark.app.chat import (
    ChatService,
    extract_sql,
    rule_based_llm,
    schema_prompt,
)
from clickhouse_realtime_analytics_demo_spark.plans.gateway import QueryRejected


def test_extract_sql_fenced():
    assert extract_sql("here:\n```sql\nSELECT 1\n```\nbye") == "SELECT 1"
    assert extract_sql("```\nSELECT 2;\n```") == "SELECT 2"
    assert extract_sql("no fence but SELECT x FROM t;") == "SELECT x FROM t"
    with pytest.raises(ValueError):
        extract_sql("I cannot answer that")


def test_schema_prompt_lists_tables(spark):
    from clickhouse_realtime_analytics_demo_spark import catalog

    catalog.register(spark, SF_DIR)
    p = schema_prompt(spark)
    assert "events(" in p and "lineitem(" in p and "```sql" in p


def test_ask_clickhouse_dialect_rewritten(spark):
    svc = ChatService(spark, SF_DIR)
    out = svc.ask("show me daily activity")
    assert "toDate" in out["sql"]  # LLM emitted ClickHouse dialect
    assert "to_date" in out["rewritten_sql"]  # shim rewrote it
    assert out["row_count"] > 0 and out["columns"] == ["d", "events", "users"]


def test_ask_count(spark):
    svc = ChatService(spark, SF_DIR)
    out = svc.ask("how many orders are there?")
    assert out["rows"][0]["n"] > 0


def test_malicious_llm_output_blocked(spark):
    svc = ChatService(spark, SF_DIR, llm=lambda p: "```sql\nDROP TABLE events\n```")
    with pytest.raises(QueryRejected):
        svc.ask("anything")


def test_chat_endpoint(spark):
    from clickhouse_realtime_analytics_demo_spark.app.rest import create_app

    app = create_app(spark, SF_DIR)
    app.testing = True
    c = app.test_client()
    r = c.post("/api/chat", json={"message": "top event types"})
    d = r.get_json()
    assert r.status_code == 200 and d["row_count"] > 0
    assert d["columns"] == ["event_type", "events"]
    assert c.post("/api/chat", json={}).status_code == 400


def test_chat_llm_emitting_dictget_executes(spark):
    """An LLM that emits the reference's dictGet idiom
    (sample_queries.sql:163-221) runs through the chat path: the
    dialect shim expands it to the dictionary layer's rewrite."""
    from clickhouse_realtime_analytics_demo_spark.catalog import table
    from clickhouse_realtime_analytics_demo_spark.plans.dictionaries import (
        register_dictionaries,
    )

    for t in ("orders", "customer"):
        table(spark, SF_DIR, t).createOrReplaceTempView(t)
    register_dictionaries(spark)
    llm = lambda p: (
        "```sql\nSELECT dictGet('dict_customer', 'c_mktsegment', o_custkey) AS seg, "
        "count() AS n FROM orders GROUP BY seg ORDER BY n DESC LIMIT 3\n```"
    )
    out = ChatService(spark, SF_DIR, llm=llm).ask("top segments?")
    assert "dictGet" in out["sql"]
    assert "dict_customer" in out["rewritten_sql"] and "dictGet" not in out["rewritten_sql"]
    assert out["row_count"] == 3 and out["rows"][0]["n"] > 0
