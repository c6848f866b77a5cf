#!/usr/bin/env python
"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
trail: the judge reads these instead of running Spark).

Usage: python tools/capture_plans.py <tag> <suffix> <query> [<query>...]
       python tools/capture_plans.py r14 before docs_neardup_pagerank ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    for name in names:
        e = registry.REGISTRY.get(name)
        if e is None:
            print(f"skip (unknown): {name}", file=sys.stderr)
            continue
        try:
            df = e.spark(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote plans/{tag}/{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
