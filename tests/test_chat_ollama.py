"""Chat path end-to-end against a deterministic stub LLM speaking the
Ollama HTTP contract (VERDICT r5 next-round #4; reference contract:
chat_service.py:100-124 request shape, :379-387 ```sql extraction,
:126-143 safety gate).

The stub is a real in-process HTTP server: it validates the request
payload the reference sends (model/prompt/stream=false/options) and
returns canned ```sql replies keyed off the question — a happy path
(ClickHouse-dialect SQL, exercising the dialect shim), an UNSAFE
reply (DROP TABLE → gateway rejection), and a MALFORMED reply (no SQL
at all). /api/chat is driven through the Flask test client, so the
whole chain — HTTP LLM call → extraction → safety gate → dialect
rewrite → Spark execution → JSON response — runs with zero model
dependency.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from clickhouse_realtime_analytics_demo_spark.app.chat import ChatService, ollama_llm
from clickhouse_realtime_analytics_demo_spark.app.rest import create_app

from tests.conftest import SF_DIR

CANNED = {
    "how many events": (
        "Counting rows in the events table.\n"
        "```sql\nSELECT count() AS n FROM events\n```"
    ),
    # ClickHouse dialect on purpose: toDate/uniq must be rewritten by
    # the dialect shim before Spark can run it
    "daily trend": (
        "```sql\nSELECT toDate(ts) AS d, count() AS events, "
        "uniq(user_id) AS users FROM events GROUP BY d ORDER BY d\n```"
    ),
    "cleanup": "Sure, clearing out the table:\n```sql\nDROP TABLE events\n```",
    "malformed": "I am not sure how to express that as a query, sorry!",
}

_seen_payloads: list[dict] = []


class _OllamaStub(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 (http.server API)
        assert self.path == "/api/generate", self.path
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        _seen_payloads.append(body)
        question = body.get("prompt", "").rsplit("\n", 1)[-1].lower()
        reply = next(
            (text for key, text in CANNED.items() if key in question),
            "No response generated",
        )
        out = json.dumps({"model": body.get("model"), "response": reply, "done": True})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out.encode())

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def stub_port():
    server = ThreadingHTTPServer(("localhost", 0), _OllamaStub)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address[1]
    server.shutdown()


@pytest.fixture()
def client(spark, stub_port):
    app = create_app(spark, SF_DIR)
    app.config["CHAT_SERVICE"] = ChatService(
        spark, SF_DIR, llm=ollama_llm(port=stub_port)
    )
    app.config["TESTING"] = True
    return app.test_client()


def test_happy_path_and_request_contract(client):
    r = client.post("/api/chat", json={"message": "How many events are there?"})
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    assert out["sql"] == "SELECT count() AS n FROM events"
    assert out["row_count"] == 1 and out["rows"][0]["n"] > 0
    # the stub saw exactly the reference's request shape
    payload = _seen_payloads[-1]
    assert payload["stream"] is False and payload["model"] == "llama3"
    assert payload["options"]["temperature"] == 0.1
    # the live schema card reached the model
    assert "events(" in payload["prompt"]


def test_dialect_rewrite_through_chat(client):
    r = client.post("/api/chat", json={"message": "Show me the daily trend"})
    assert r.status_code == 200, r.get_json()
    out = r.get_json()
    # ClickHouse functions in, Spark-executable SQL out
    assert "toDate" in out["sql"] and "uniq(" in out["sql"]
    assert "toDate" not in out["rewritten_sql"]
    assert out["columns"] == ["d", "events", "users"]
    assert out["row_count"] > 0


def test_unsafe_sql_rejected(client):
    r = client.post("/api/chat", json={"message": "Please run cleanup"})
    assert r.status_code == 400
    err = r.get_json()["error"]
    assert "read-only" in err or "DROP" in err.upper()


def test_malformed_reply_is_clean_error(client):
    r = client.post("/api/chat", json={"message": "malformed please"})
    assert r.status_code == 500
    assert "no SQL" in r.get_json()["error"]
