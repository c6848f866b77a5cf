#!/usr/bin/env python
"""Sampled-oracle CORRECTNESS at the 10⁴ octave (VERDICT r11 #5):
cross-engine signal one octave past sf1000, at bounded oracle cost.

Full-tier grading is measured-infeasible here — the minhash oracle
alone cost 1,687 s at sf1000 (CORRECTNESS_SF1000.json) and scales
~linearly to ~5 h at 50M docs; the two-level-prune oracle needed
~90 GB of materialized intermediates at 2M vectors. So this tool
grades a DETERMINISTIC 1% SLICE of the real tier files on BOTH
engines: ``doc_id % 100 = 0`` / ``vec_id % 100 = 0``, materialized
once into ``testdata_sf10000_slice/`` (the slice rule and row counts
are recorded in the slice's ``_gen_meta.json`` and per entry in the
artifact). The slice is drawn from the tier's own parquet — replica
indices up to 10⁴, the 8-worker directory layout's content — so what
is graded is the 10⁴ generator's data, at 1% volume: real
cross-engine signal for the scan→operator→hash pipeline one octave
past where full grading stops, NOT a full-width grade (cost-shape and
plan audits at full width live in BENCH_SF10000.json).

Usage: python tools/check_sf10000.py [TIER_DIR] [SLICE_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from tools.check_correctness import register_views  # noqa: E402
from tools.check_sf1000 import check_one  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent

#: slice predicates per table — the ONE definition of the sample.
#:
#: documents slice by WHOLE REPLICA, every 100th (1% of the corpus:
#: 100 of the 10⁴ replicas × 5k docs, spanning the full replica-index
#: range): near-dup pairs are within-replica by construction
#: (cross-replica shingle overlap is zero — gen_sf1's token salt), so
#: a replica-spread slice preserves the tier's pair structure
#: (~25,600 expected minhash pairs) where a mod-id slice graded
#: pair ops green-but-empty (both endpoints of a pair almost never
#: share id % 100).
#:
#: embeddings sample at 2%, not 1%: 400k vectors puts auto_k at
#: k = 1600 ≥ TWO_LEVEL_MIN_K, so `semdedup_prune_auto` routes its
#: TWO-LEVEL branch here — the k≥1024 side of the production router
#: gets oracle-graded (its flat side is graded at sf0.01/0.1), while
#: the slice stays small enough that every oracle is tractable (the
#: autobits pair structure is the in-query planted twins, present at
#: any slice).
SLICE_RULES = {
    "documents": "(doc_id // 100000) % 100 = 0",
    "embeddings": "vec_id % 50 = 0",
}

#: graded entries: the tier subset's oracle-bearing scale paths plus
#: the round-12 store-amortized forms (same oracles as their batch
#: siblings — so the from-store path gets cross-engine signal at this
#: octave too)
SUBSET = [
    "dedup_exact",
    "text_token_stats",
    "corpus_vocab_kmv",
    "semdedup_prune_two_level",
    "semdedup_prune_auto",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_store",
    "dedup_embedding_lsh_autobits",
    "dedup_embedding_lsh_autobits_store",
    # round-13 (VERDICT r12 #5): the graph family over slice-derived
    # near-dup pairs — the replica-spread slice preserves pair
    # structure (pairs are within-replica by construction), so the
    # components/triangles/pagerank path gets cross-engine signal one
    # octave past sf1000, where it was previously ungraded above 100×
    "dedup_clusters",
    "docs_neardup_triangles",
    "docs_neardup_pagerank",
]


def build_slice(tier: str, out: str) -> dict:
    con = duckdb.connect()
    counts = {}
    os.makedirs(out, exist_ok=True)
    for t, pred in SLICE_RULES.items():
        src = os.path.join(tier, f"{t}.parquet")
        glob = f"{src}/*.parquet" if os.path.isdir(src) else src
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{glob}') WHERE {pred}) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        counts[t] = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
    meta = {
        "derived_from": tier,
        "slice_rules": SLICE_RULES,
        "rows": counts,
        "note": (
            "deterministic 1% sample of the 10^4 tier's own parquet — "
            "the sampled-oracle correctness fixture (check_sf10000.py)"
        ),
        "generated_at": time.time(),
    }
    with open(os.path.join(out, "_gen_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    con.close()
    return meta


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata_sf10000"
    )
    slice_dir = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "testdata_sf10000_slice"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else str(
        ROOT / "CORRECTNESS_SF10000.json"
    )
    if not os.path.exists(os.path.join(slice_dir, "_gen_meta.json")):
        meta = build_slice(tier, slice_dir)
    else:
        with open(os.path.join(slice_dir, "_gen_meta.json")) as f:
            meta = json.load(f)
    print(json.dumps({"slice": meta["rows"]}), flush=True)

    spark = get_spark(app_name="check_sf10000")
    con = duckdb.connect()
    con.execute("SET memory_limit='100GB'")
    con.execute(f"SET temp_directory='{ROOT / '.duckdb_tmp'}'")
    register_views(con, slice_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    failures = 0
    for name in SUBSET:
        rec = check_one(spark, con, slice_dir, name, qs[name], oracles[name])
        rec["slice_rule"] = SLICE_RULES
        report[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if rec["err"]:
            print(f"FAIL  {name}: {rec['err']}", flush=True)
            failures += 1
        elif ok:
            print(
                f"OK    {name}: {rec['spark_rows']} rows "
                f"(spark {rec['spark_s']}s, oracle {rec['oracle_s']}s)",
                flush=True,
            )
        else:
            print(
                f"FAIL  {name}: rows {rec['spark_rows']}/"
                f"{rec['oracle_rows']} schema={rec['schema_match']} "
                f"hash={rec['hash_match']}",
                flush=True,
            )
            failures += 1

    green = [
        n for n in report
        if report[n]["rows_match"] and report[n]["schema_match"]
        and report[n]["hash_match"]
    ]
    out = {
        "_meta": {
            "tier": f"10^4 octave sampled oracle ({Path(tier).name})",
            "slice": meta,
            "entries": len(report),
            "green": len(green),
            "note": (
                "deterministic-slice grading (1% of the tier's own "
                "parquet on BOTH engines): real cross-engine signal one "
                "octave past sf1000 at bounded oracle cost — full-width "
                "grading is measured-infeasible (minhash oracle 1687 s "
                "at sf1000 => ~5 h here; two-level-prune oracle ~90 GB "
                "of intermediates at 2M vectors). Full-width cost shape "
                "+ plan audits: BENCH_SF10000.json"
            ),
            "generated_at": time.time(),
        },
        **dict(sorted(report.items())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {out_path}: {len(green)}/{len(report)} green, "
          f"{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
