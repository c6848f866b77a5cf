"""Opt-in driver-strength sweep: every registry query vs its DuckDB
oracle at sf0.01 (the driver's grading scale), not just the 50-entry
prefix the driver samples.

Run with::

    python -m pytest -m full_oracle tests/test_full_oracle.py -q

or equivalently ``python tools/check_correctness.py /root/testdata/sf0.01
CORRECTNESS_FULL.json`` (same code path; also writes the JSON report).
"""

import json
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

pytestmark = pytest.mark.full_oracle

FULL_SF_DIR = os.environ.get("SPARK_GRAFT_FULL_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "CORRECTNESS_FULL.json")


def test_full_registry_oracle_sweep(spark):
    import tools.check_correctness as cc

    cc.SF_DIR = FULL_SF_DIR
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FULL_SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report, bad = {}, []
    for name, fn in qs.items():
        rec, detail = cc.check_one(spark, con, name, fn, oracles)
        report[name] = rec
        if rec["err"] or (
            not rec.get("no_oracle")
            and not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"])
        ):
            bad.append((name, rec["err"] or detail))
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    assert not bad, f"{len(bad)} queries failed the sf0.01 oracle sweep: {bad}"
