#!/usr/bin/env python
"""Parquet-resident NULL fixture (VERDICT r11 #4 / r10 #6 as
originally asked): derive a repo-local nulls tier from a driver
testdata tier by overlaying deterministic NULLs into real group-key /
join-key / value columns, so the SCAN path — not an in-query
``nullif`` both engines share — is what carries NULL into every graded
aggregation. The driver's own tiers are read-only; this writes
``<out>/`` next to the repo's other derived tiers.

The overlay rule (recorded in ``_gen_meta.json``):

  documents.source  -> NULL where doc_id  % 20 == 3   (~5%)
  documents.lang    -> NULL where doc_id  % 31 == 7   (~3%)
  events.user_id    -> NULL where event_id % 17 == 5  (~6%)
  events.event_type -> NULL where event_id % 23 == 11 (~4%)
  events.value      -> NULL where event_id % 29 == 13 (~3%)

Every other table copies through byte-identical. DuckDB writes the
overlay (one CASE per column) so the rule is one SQL expression both
engines could re-derive; graded entries then read the SAME parquet on
both engines — the NULLs are resident in the files, not synthesized
in-query.

Usage: python tools/gen_nulls.py [SRC_DIR] [OUT_DIR]
       (defaults /root/testdata/sf0.1 -> testdata_sf0.1_nulls)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

RULES = {
    "documents": {
        "source": "CASE WHEN doc_id % 20 = 3 THEN NULL ELSE source END",
        "lang": "CASE WHEN doc_id % 31 = 7 THEN NULL ELSE lang END",
    },
    "events": {
        "user_id": "CASE WHEN event_id % 17 = 5 THEN NULL ELSE user_id END",
        "event_type": (
            "CASE WHEN event_id % 23 = 11 THEN NULL ELSE event_type END"
        ),
        "value": "CASE WHEN event_id % 29 = 13 THEN NULL ELSE value END",
    },
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "testdata_sf0.1_nulls"
    )
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    null_counts: dict[str, dict[str, int]] = {}
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(sp):
            continue
        if t not in RULES:
            shutil.copyfile(sp, dp)
            continue
        cols = [
            r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{sp}')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{RULES[t][c]} AS {c}" if c in RULES[t] else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{sp}')) TO '{dp}' "
            f"(FORMAT PARQUET)"
        )
        null_counts[t] = {
            c: con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{dp}') "
                f"WHERE {c} IS NULL"
            ).fetchone()[0]
            for c in RULES[t]
        }
    with open(os.path.join(out, "_gen_meta.json"), "w") as f:
        json.dump(
            {
                "derived_from": src,
                "overlay_rules": RULES,
                "null_counts": null_counts,
                "note": (
                    "parquet-RESIDENT null fixture: the files themselves "
                    "carry NULL group keys / join keys / agg values; "
                    "non-overlaid tables copy through byte-identical"
                ),
                "generated_at": time.time(),
            },
            f,
            indent=1,
        )
    print(json.dumps(null_counts))


if __name__ == "__main__":
    main()
