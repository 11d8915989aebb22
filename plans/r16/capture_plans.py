"""Capture .explain("formatted") for every HEADLINE query into
plans/r16/<query>_<tag>.txt (tag = before/after). Round-15 evidence
tooling — plans are load-independent, so captures are valid even on a
noisy box.

Usage: python plans/r16/capture_plans.py <tag> [query1,query2,...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[2])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from clickhouse_realtime_analytics_demo_spark.queries import all_queries  # noqa: E402
from clickhouse_realtime_analytics_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    out_dir = Path(__file__).resolve().parent
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"plans-r16-{tag}")
    reg = all_queries()
    for name in HEADLINE:
        if only and name not in only:
            continue
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(name, "->", f"{name}_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
