"""corpus_select_budget must keep NULL-lang documents (ADVICE r10,
medium): the window partition kind was derived via substring(lang),
which is NULL for NULL lang, and exact_global_ranks' inner equi-join
on the kind never matches NULL keys — null-lang docs silently vanished
from ranking/selection while the DuckDB oracle kept them. Green before
the fix only because the driver-regenerated testdata happens to carry
no NULL lang; this test plants one so the hazard can't silently
return with a data change.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR, TABLES, compare_with_oracle


def _write_docs_with_null_lang(tmp_path) -> str:
    # duck_connection registers every table eagerly; link the untouched
    # ones through so only documents differs
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{SF_DIR}/{name}.parquet", tmp_path / f"{name}.parquet")
    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    d = t.to_pydict()
    # plant two NULL-lang docs: one high-quality (inside any plausible
    # cut) and one copy of an existing mid-range text (exercises the
    # quality-tie doc_id ordering across engines too)
    base = next(i for i, txt in enumerate(d["text"]) if txt and len(txt.split()) > 20)
    top_text = " ".join(f"word{i}" for i in range(60))
    for text in (top_text, d["text"][base]):
        d["doc_id"].append(max(d["doc_id"]) + 1)
        d["text"].append(text)
        d["lang"].append(None)
        d["source"].append("nulltest")
        d["n_chars"].append(len(text))
    pq.write_table(pa.Table.from_pydict(d, schema=t.schema), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_select_budget_keeps_null_lang_docs(spark, tmp_path):
    sf_dir = _write_docs_with_null_lang(tmp_path)
    # exact Spark-vs-DuckDB equality on the planted-null corpus: the
    # NULL-lang group must appear in BOTH with identical doc/token
    # counts, proving ranking never dropped the null rows
    compare_with_oracle(spark, "corpus_select_budget", sf_dir)

    from clickhouse_realtime_analytics_demo_spark.queries import all_queries

    rows = all_queries()["corpus_select_budget"].fn(spark, sf_dir).collect()
    null_groups = [r for r in rows if r["lang"] is None]
    assert null_groups and null_groups[0]["selected_docs"] >= 1
