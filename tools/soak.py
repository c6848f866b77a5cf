#!/usr/bin/env python
"""Soak run: generate an N-row NDJSON tree (muskie-log shape, like the
reference's tools/mktestdata) and measure raw-scan throughput through
the full variant pipeline — the reference's resource regression
(tst.scan_250k.sh) scaled up, with rows/sec instead of an RSS ceiling
(Spark spills; memory is bounded by design, not by luck).

Usage: python tools/soak.py [N_ROWS] [N_FILES]
Prints one JSON line with timings.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dragnet_spark.query import QueryConfig  # noqa: E402
from dragnet_spark.scan import scan_ndjson  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402

OPERATIONS = [
    "getstorage", "putstorage", "deletestorage", "headstorage",
    "getjoberrors", "putdirectory", "putobject",
]
HOSTS = ["janey", "kearney", "ralph", "sherri", "wendell"]
METHODS = ["GET", "PUT", "DELETE", "HEAD"]
CALLERS = ["poseidon", "admin", None, "MISSING"]


def generate(root: str, n_rows: int, n_files: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    per = n_rows // n_files
    for f in range(n_files):
        day = f"2014-05-{(f % 28) + 1:02d}"
        d = Path(root) / "2014" / day
        d.mkdir(parents=True, exist_ok=True)
        with open(d / f"log{f}.log", "w") as fh:
            for i in range(per):
                caller = rng.choice(CALLERS)
                rec = {
                    "time": f"{day.replace('-', '-', 1)}T%02d:%02d:%02d.000Z"
                    % (rng.randrange(24), rng.randrange(60), rng.randrange(60)),
                    "host": rng.choice(HOSTS),
                    "operation": rng.choice(OPERATIONS),
                    "req": {
                        "method": rng.choice(METHODS),
                        "url": f"/random/url/{i}",
                    },
                    "res": {"statusCode": rng.choice([200, 204, 404, 500])},
                    "latency": str(rng.randrange(1, 5000)),
                }
                if caller != "MISSING":
                    rec["req"]["caller"] = caller
                fh.write(json.dumps(rec) + "\n")
            if f == 0:  # corrupt-line tolerance at scale too
                fh.write("{not json\n")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    root = tempfile.mkdtemp(prefix="dn_soak_")
    t0 = time.time()
    generate(root, n_rows, n_files)
    gen_s = time.time() - t0

    spark = get_spark(app_name="dn_soak")
    spark.range(1).count()
    out = {}

    for label, q in [
        ("count", QueryConfig.load()),
        ("group2", QueryConfig.load("operation,req.method")),
        (
            "histogram_day",
            QueryConfig.load(
                "timestamp[date,field=time,aggr=lquantize,step=86400],"
                "latency[aggr=quantize]"
            ),
        ),
        (
            "filter_group",
            QueryConfig.load(
                "host,req.caller", filter={"eq": ["res.statusCode", "200"]}
            ),
        ),
    ]:
        t0 = time.time()
        rows = scan_ndjson(spark, root, q).collect()
        dt = time.time() - t0
        out[label] = {
            "sec": round(dt, 2),
            "rows_per_sec": int(n_rows / dt),
            "groups": len(rows),
        }

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"n_rows": n_rows, "gen_sec": round(gen_s, 1), **out}))


if __name__ == "__main__":
    main()
