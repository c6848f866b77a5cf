"""Registry-wide same-table multi-scan sweep (the r14 session-3
pattern, promoted to a committed tool).

Builds every registry query's DataFrame, takes explain("formatted"),
and counts `Scan parquet` occurrences PER SOURCE FILE in each plan.
Multi-TABLE scans (joins) are expected; >= THRESH scans of the SAME
table flag a re-embedded lineage (Catalyst re-executing a subplan per
reference) unless documented as deliberate (store-backed probes, the
jaccard-prefix semi path).

Note: building a query executes its eager checkpoints, so this sweep
runs real jobs; checkpointed intermediates then appear as
`Scan ExistingRDD` (counted separately, informational).

Usage: python tools/scan_sweep.py [THRESH]   (default 3)
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    spark = get_spark(app_name="scan_sweep")
    flagged = 0
    names = sorted(registry.REGISTRY)
    for name in names:
        e = registry.REGISTRY[name]
        try:
            df = e.spark(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        # one line per scan: "Scan parquet [id]" + a Location detail
        # block; attribute scans by the Location path's basename
        tables = Counter(
            os.path.basename(m.rstrip("]").rstrip("/"))
            for m in re.findall(r"Location:.*?\[([^\]]*)", plan)
        )
        rdd = plan.count("Scan ExistingRDD")
        multi = {t: c for t, c in tables.items() if c >= THRESH}
        if multi:
            flagged += 1
            print(f"MULTI {name}: {multi} (existingRDD={rdd})", flush=True)
    print(f"\n{flagged}/{len(names)} queries with >= {THRESH} same-table scans")
    spark.stop()


if __name__ == "__main__":
    main()
