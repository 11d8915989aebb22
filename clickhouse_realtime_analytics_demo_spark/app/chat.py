"""NL→SQL chat service — parity with the reference's chat gateway
(chat_service.py: schema prompt :35-98, rules :145-177, LLM call
:100-124, ```sql extraction :379-387, safety gate :126-143,
execute + explain :356-405).

The LLM itself is pluggable (``llm: Callable[[prompt], text]``): the
reference calls a local Ollama HTTP endpoint; this container has no
LLM, so the default is a deterministic rule-based translator covering
the demo's common question shapes (count/top-k/daily trends). The
plumbing around the LLM — prompt construction from the live catalog
schema, fenced-SQL extraction, read-only validation, ClickHouse→Spark
dialect rewrite, execution — is the engine surface and is fully real.

Swapping in a real model is one constructor argument:
``ChatService(spark, sf_dir, llm=my_ollama_call)``.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from clickhouse_realtime_analytics_demo_spark import catalog
from clickhouse_realtime_analytics_demo_spark.plans import gateway

_SQL_FENCE = re.compile(r"```sql\s*(.+?)\s*```", re.DOTALL | re.IGNORECASE)
_ANY_FENCE = re.compile(r"```\s*(.+?)\s*```", re.DOTALL)


def extract_sql(text: str) -> str:
    """Pull the SQL out of an LLM reply: prefer a ```sql fence, then
    any fence, then a bare SELECT/WITH statement (chat_service.py:
    379-387 semantics, fence-first)."""
    m = _SQL_FENCE.search(text) or _ANY_FENCE.search(text)
    if m:
        return m.group(1).strip().rstrip(";")
    m = re.search(r"(?is)\b(SELECT|WITH)\b.*", text)
    if m:
        return m.group(0).strip().rstrip(";")
    raise ValueError("no SQL found in model reply")


def schema_prompt(spark: SparkSession) -> str:
    """Live schema card for the system prompt — built from the catalog
    (the reference hardcodes its schema text; ours can't drift)."""
    lines = ["You translate analytics questions to SQL over these tables:"]
    for t in catalog.TABLES:
        try:
            cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in spark.table(t).schema)
        except Exception:
            continue
        lines.append(f"- {t}({cols})")
    lines.append(
        "Rules: read-only SELECT only; always LIMIT large results; "
        "reply with the SQL in a ```sql fence."
    )
    return "\n".join(lines)


def rule_based_llm(prompt: str) -> str:
    """Deterministic stand-in for the LLM: answers the question shapes
    the reference demo showcases. The question arrives as the last
    prompt line (see ChatService.ask)."""
    q = prompt.rsplit("\n", 1)[-1].lower()
    if "how many" in q or q.startswith("count"):
        for t in catalog.TABLES:
            if t.rstrip("s") in q or t in q:
                return f"```sql\nSELECT count() AS n FROM {t}\n```"
        return "```sql\nSELECT count() AS n FROM events\n```"
    if "top" in q and ("event" in q or "type" in q):
        return (
            "```sql\nSELECT event_type, count() AS events FROM events "
            "GROUP BY event_type ORDER BY events DESC LIMIT 10\n```"
        )
    if "daily" in q or "per day" in q:
        return (
            "```sql\nSELECT toDate(ts) AS d, count() AS events, uniq(user_id) AS users "
            "FROM events GROUP BY d ORDER BY d\n```"
        )
    if "revenue" in q and "nation" in q:
        return (
            "```sql\nSELECT n.n_name AS nation, sum(o.o_totalprice) AS revenue "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY nation ORDER BY revenue DESC LIMIT 10\n```"
        )
    return "```sql\nSELECT count() AS n FROM events\n```"


def ollama_llm(
    host: str = "localhost",
    port: int = 11434,
    model: str = "llama3",
    timeout_s: float = 60.0,
) -> Callable[[str], str]:
    """LLM callable speaking the Ollama HTTP contract the reference
    uses (chat_service.py:100-124): POST /api/generate with
    {model, prompt, stream: false, options}, read the JSON body's
    "response" field. Stdlib-only, so it works against a real Ollama
    daemon or the deterministic stub in tests/test_chat_ollama.py —
    the engine-side chain (extraction → safety gate → dialect rewrite
    → execute) is identical either way."""
    import json as _json
    import urllib.request

    url = f"http://{host}:{port}/api/generate"

    def call(prompt: str) -> str:
        payload = _json.dumps(
            {
                "model": model,
                "prompt": prompt,
                "stream": False,
                # reference options, chat_service.py:107-111
                "options": {"temperature": 0.1, "top_p": 0.9, "max_tokens": 1000},
            }
        ).encode()
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = _json.loads(resp.read().decode())
        return body.get("response", "No response generated")

    return call


@dataclass
class ChatService:
    spark: SparkSession
    sf_dir: str
    llm: Callable[[str], str] = rule_based_llm
    history: list[dict] = field(default_factory=list)

    def __post_init__(self) -> None:
        catalog.register(self.spark, self.sf_dir)
        self._prompt_prefix = schema_prompt(self.spark)

    def ask(self, question: str, limit: int = 100) -> dict[str, Any]:
        """question → prompt → LLM → extract → validate → dialect
        rewrite → execute → JSON-able reply (chat_service.py:356-405
        response contract: sql + results + explanation)."""
        prompt = f"{self._prompt_prefix}\n{question}"
        reply = self.llm(prompt)
        sql = extract_sql(reply)
        res = gateway.execute(self.spark, sql)  # validates + rewrites
        rows = [r.asDict() for r in res.df.limit(limit).collect()]
        out = {
            "question": question,
            "sql": sql,
            "rewritten_sql": res.rewritten_sql,
            "columns": res.df.columns,
            "rows": rows,
            "row_count": len(rows),
        }
        self.history.append(out)
        return out
