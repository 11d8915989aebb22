"""HTTP JSONEachRow ingest parity (S1/S2: generate_data.py:44-59).

Schema-on-write: explicit table schemas, MATERIALIZED/DEFAULT
derivation, strict rejection of malformed or incomplete rows; each
insert block lands as one sorted month-partitioned part readable by
the same lake readers the streaming path uses.
"""

from __future__ import annotations

import json

import pytest

from clickhouse_realtime_analytics_demo_spark.app.rest import create_app
from clickhouse_realtime_analytics_demo_spark.sources import json_ingest, writer

from tests.conftest import SF_DIR


def _event(i: int, **over) -> dict:
    row = {
        "event_id": i,
        "user_id": i % 7 + 1,
        "event_type": "page_view",
        "event_timestamp": "2024-02-03 10:15:00",
        "page_url": f"/page/{i}",
        "session_id": f"sess-{i % 7 + 1}-1",
        "device_type": "mobile",
        "browser": "Chrome",
        "country": "DE",
        "duration_seconds": 12,
    }
    row.update(over)
    return row


def _ndjson(rows) -> str:
    return "\n".join(json.dumps(r) for r in rows)


def test_insert_round_trip_with_derived_columns(spark, tmp_path):
    lake = str(tmp_path)
    rows = [_event(i) for i in range(1, 101)]
    rows[0]["revenue"] = "12.34"  # explicit money survives
    n = json_ingest.insert_json_rows(spark, lake, "events", _ndjson(rows))
    assert n == 100
    back = writer.read_table(spark, lake, "events")
    assert back.count() == 100
    got = {r.event_id: r for r in back.collect()}
    # MATERIALIZED event_date = toDate(event_timestamp)
    assert str(got[2].event_date) == "2024-02-03"
    # DEFAULT revenue 0, explicit value kept
    assert float(got[2].revenue) == 0.0
    assert float(got[1].revenue) == 12.34
    # month partition exists (PARTITION BY toYYYYMM)
    assert (tmp_path / "events" / "yyyymm=202402").exists()


def test_insert_appends_parts(spark, tmp_path):
    lake = str(tmp_path)
    json_ingest.insert_json_rows(spark, lake, "events", _ndjson([_event(1)]))
    json_ingest.insert_json_rows(spark, lake, "events", _ndjson([_event(2), _event(3)]))
    assert writer.read_table(spark, lake, "events").count() == 3


def test_rejects_unknown_table_and_bad_rows(spark, tmp_path):
    lake = str(tmp_path)
    with pytest.raises(json_ingest.BadRows, match="unknown table"):
        json_ingest.insert_json_rows(spark, lake, "nope", "{}")
    with pytest.raises(json_ingest.BadRows, match="empty insert"):
        json_ingest.insert_json_rows(spark, lake, "events", "   \n ")
    # malformed JSON line
    with pytest.raises(json_ingest.BadRows, match="required"):
        json_ingest.insert_json_rows(spark, lake, "events", "{not json")
    # missing required field (no event_type)
    bad = _event(9)
    del bad["event_type"]
    with pytest.raises(json_ingest.BadRows, match="required"):
        json_ingest.insert_json_rows(spark, lake, "events", _ndjson([bad]))
    # nothing was written by any rejected insert
    assert not (tmp_path / "events").exists()


def test_orders_and_users_derivations(spark, tmp_path):
    lake = str(tmp_path)
    order = {
        "order_id": 1, "user_id": 2, "product_id": 3, "quantity": 2,
        "order_timestamp": "2024-03-05 08:00:00", "total_amount": "99.50",
        "status": "completed", "payment_method": "paypal",
    }
    assert json_ingest.insert_json_rows(spark, lake, "orders", _ndjson([order])) == 1
    got = writer.read_table(spark, lake, "orders").collect()[0]
    assert str(got.order_date) == "2024-03-05"  # derived from timestamp
    assert float(got.total_amount) == 99.50


def test_http_insert_endpoint(spark, tmp_path):
    app = create_app(spark, SF_DIR, lake_dir=str(tmp_path))
    c = app.test_client()
    # NDJSON body
    r = c.post("/api/insert/events", data=_ndjson([_event(1), _event(2)]))
    assert r.status_code == 200 and r.get_json() == {"table": "events", "rows": 2}
    # JSON-array body
    r = c.post("/api/insert/events", json=[_event(3)])
    assert r.status_code == 200 and r.get_json()["rows"] == 1
    assert writer.read_table(spark, str(tmp_path), "events").count() == 3
    # validation surfaces as 400
    r = c.post("/api/insert/events", data="{broken")
    assert r.status_code == 400 and "required" in r.get_json()["error"]
    r = c.post("/api/insert/nope", data="{}")
    assert r.status_code == 400
    # unconfigured lake -> 503
    app2 = create_app(spark, SF_DIR)
    assert app2.test_client().post("/api/insert/events", data="{}").status_code == 503
