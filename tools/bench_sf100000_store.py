#!/usr/bin/env python
"""The 10⁵ store-amortized run (VERDICT r13 #1): execute the dial
SCALE.md derives for the octave whose corpus does not fit this box.

The tier is ~118 GB of source parquet against ~65-77 GB free, so the
corpus is never resident: ten fold-generated-and-DELETED octave slices
(tools/gen_octave.py --scale 10000 --offset i*10000 — every transform
keys off the ABSOLUTE replica index, so the folds ARE the 10⁵ tier's
content, 11.8 GB at a time) are appended into PERSISTENT band/SRP
stores (the signature stage, paid once per document: the production
ingest loop measured at 10⁴), then candidate discovery runs from the
persisted rows alone. Discovery itself needs the bounded form at this
tier — the one-shot collision exchange (n·bands ≈ 4×10⁹ band rows)
projects past free disk, so `band_store_candidates_bounded` /
`srp_store_candidates_bounded` slice the join on its own hash key
(exact partition; pair set provably identical, pinned by tests).

Each step runs in its own PROCESS (fresh JVM) so fold walls are
comparable — the r13 semdedup attribution measured session aging as
the dominant non-linear term on this box. The artifact
(BENCH_SF100000_STORE.json) is updated after every step, so a crash
keeps all completed evidence and re-running a step resumes.

What the artifact deliberately does NOT contain: the exact-verify
stage. Verify reads pair endpoints' text/vectors and the corpus is
deleted by construction on this box; on a cluster the same bounded
slices read endpoints from the corpus's durable home, and the verify
machinery is graded bit-identical through 10⁴. The declared_skips
entry carries that storage math (the no-silent-caps rule).

Usage:
  python tools/bench_sf100000_store.py gen I       # generate fold I
  python tools/bench_sf100000_store.py append I    # append fold I, delete it
  python tools/bench_sf100000_store.py discover minhash|srp
  python tools/bench_sf100000_store.py finalize
(tools/run_sf100000.sh pipelines gen I+1 against append I.)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent
ARTIFACT = ROOT / "BENCH_SF100000_STORE.json"
STORE_ROOT = ROOT / ".stores_sf100000"
BAND_PATH = STORE_ROOT / "minhash_band"
SRP_PATH = STORE_ROOT / "srp_autobits"

FOLDS = 10
SCALE_PER_FOLD = 10_000           # replicas per fold (the 10⁴ tier)
DOCS_PER_FOLD = 50_000_000
VECS_PER_FOLD = 20_000_000
TARGET_VECS = FOLDS * VECS_PER_FOLD   # 2×10⁸ — sizes the SRP width
# minhash banding: the 10⁴-tier params (BENCH_SF10000.json) so fold
# walls are directly comparable to that tier's measured build
NUM_HASHES, BANDS, NGRAM = 16, 8, 3
SRP_BANDS, SRP_DIMS, SRP_SEED = 6, 64, 42
# discovery slicing: per-slice exchange budget (bytes)
DISCOVER_BUDGET = 12 * 1024**3
MIN_FREE_FOR_GEN = 18 * 1024**3


def _fold_dir(i: int) -> Path:
    return ROOT / f"testdata_sf100000_fold{i}"


def _load() -> dict:
    if ARTIFACT.exists():
        with ARTIFACT.open() as f:
            return json.load(f)
    return {
        "tier": "sf100000 (5e8 docs / 2e8 vectors), store-amortized",
        "plan": "SCALE.md r13: fold-generate-append-delete into "
                "persistent stores; discovery from persisted rows",
        "folds": {},
        "discovery": {},
        "errors": {},
    }


def _save(state: dict) -> None:
    with ARTIFACT.open("w") as f:
        json.dump(state, f, indent=1)


def _update(mutator) -> dict:
    """Locked read-modify-write of the artifact. gen(i+1) and
    append(i) run CONCURRENTLY by design (the runner overlaps them),
    and whole-file save-last-wins silently drops the other process's
    fold record — measured: fold 1's gen wall vanished when append 0's
    final save landed with a state loaded before gen 1 finished. Every
    mutation now reloads under an exclusive flock, applies, and saves,
    so the two writers interleave instead of clobbering."""
    import fcntl

    os.makedirs(STORE_ROOT, exist_ok=True)
    with open(STORE_ROOT / ".state.lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            state = _load()
            mutator(state)
            _save(state)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return state


def _update_fold(i: int, fields: dict) -> None:
    _update(lambda s: s["folds"].setdefault(str(i), {}).update(fields))


def _free() -> int:
    st = os.statvfs(str(ROOT))
    return st.f_bavail * st.f_frsize


def _du(path) -> int:
    out = subprocess.run(
        ["du", "-sb", str(path)], capture_output=True, text=True,
        check=False,
    ).stdout
    try:
        return int(out.split()[0])
    except (IndexError, ValueError):
        return 0


def _session(name: str):
    from dragnet_spark.session import get_spark

    return get_spark(app_name=name)


def cmd_gen(i: int) -> None:
    fd = _fold_dir(i)
    frec = _load()["folds"].get(str(i), {})
    if frec.get("gen_s") is not None and (fd / "_gen_meta.json").exists():
        print(f"fold {i}: already generated")
        return
    free = _free()
    if free < MIN_FREE_FOR_GEN:
        raise SystemExit(
            f"fold {i}: refusing to generate with {free/1e9:.1f} GB free "
            f"(< {MIN_FREE_FOR_GEN/1e9:.0f} GB) — the fold is ~12 GB and "
            f"the stores keep growing; free space or lower FOLDS"
        )
    shutil.rmtree(fd, ignore_errors=True)  # partial prior gen
    t0 = time.time()
    subprocess.run(
        [
            sys.executable, str(ROOT / "tools" / "gen_octave.py"),
            str(fd), "--scale", str(SCALE_PER_FOLD),
            "--offset", str(i * SCALE_PER_FOLD),
            "--tables", "documents,embeddings", "--workers", "8",
        ],
        check=True,
    )
    fields = {
        "gen_s": round(time.time() - t0, 1),
        "fold_bytes": _du(fd),
        "free_after_gen": _free(),
    }
    _update_fold(i, fields)
    print(f"fold {i}: generated in {fields['gen_s']}s "
          f"({fields['fold_bytes']/1e9:.1f} GB)")


def cmd_append(i: int) -> None:
    frec = _load()["folds"].get(str(i), {})
    if frec.get("append_done"):
        print(f"fold {i}: already appended")
        return
    fd = _fold_dir(i)
    spark = _session(f"sf100000_append_f{i}")

    from dragnet_spark.index.fingerprints import (
        BAND_META,
        SRP_META,
        append_band_keys,
        append_srp_keys,
        build_band_store,
        build_srp_store,
    )
    from dragnet_spark.ops.dedup import auto_srp_width

    os.makedirs(STORE_ROOT, exist_ok=True)
    # ``band_done`` makes a mid-fold crash resumable WITHOUT
    # double-appending: band appends are not idempotent, so a rerun
    # after a crash during the SRP step must skip the band step (its
    # keys are already in the store — and the fold's documents are
    # deleted by then anyway)
    if not frec.get("band_done"):
        docs = spark.read.parquet(str(fd / "documents.parquet"))
        t0 = time.time()
        if not (BAND_PATH / BAND_META).exists():
            # fold 0 creates the store; build == signatures + write,
            # the same work an append pays, so its wall sits in the
            # same series (annotated)
            build_band_store(
                spark, docs, str(BAND_PATH),
                num_hashes=NUM_HASHES, bands=BANDS, ngram=NGRAM,
            )
            mode = "build"
        else:
            append_band_keys(spark, docs, str(BAND_PATH))
            mode = "append"
        _update_fold(i, {
            "band_mode": mode,
            "band_append_s": round(time.time() - t0, 1),
            "band_store_bytes": _du(BAND_PATH),
            "band_done": True,
        })
        # the fold's documents are consumed: delete before the
        # embedding append so peak disk is stores + ONE table of the
        # next fold
        shutil.rmtree(fd / "documents.parquet", ignore_errors=True)

    emb = spark.read.parquet(str(fd / "embeddings.parquet"))
    t0 = time.time()
    if not (SRP_PATH / SRP_META).exists():
        # width sized for the TARGET corpus at store creation (the
        # store's band width is immutable): auto formula at 2e8
        # vectors / 6 bands -> 28 bits
        bits, planes = auto_srp_width(
            TARGET_VECS, SRP_BANDS, SRP_DIMS, SRP_SEED
        )
        _update(lambda s: s.__setitem__("srp_bits", bits))
        build_srp_store(
            spark, emb, str(SRP_PATH),
            vec_col="embedding", id_col="vec_id",
            bands=SRP_BANDS, bits_per_band=bits, seed=SRP_SEED,
            dims=SRP_DIMS,
            planes_q=planes,
            with_pairs=False,
        )
        mode = "build"
    else:
        append_srp_keys(spark, emb, str(SRP_PATH))
        mode = "append"
    fields = {
        "srp_mode": mode,
        "srp_append_s": round(time.time() - t0, 1),
        "srp_store_bytes": _du(SRP_PATH),
        "append_done": True,
        "free_after_append": _free(),
    }
    shutil.rmtree(fd, ignore_errors=True)
    _update_fold(i, fields)
    print(f"fold {i}: srp {fields['srp_append_s']}s "
          f"({fields['srp_store_bytes']/1e9:.2f} GB)")


def cmd_discover(family: str) -> None:
    rec: dict = dict(_load()["discovery"].get(family, {}))
    if rec.get("n_candidates") is not None:
        print(f"{family}: discovery already recorded")
        return
    spark = _session(f"sf100000_discover_{family}")
    from pyspark.sql import functions as F  # noqa: F401

    if family == "minhash":
        from dragnet_spark.index.fingerprints import (
            BAND_DIR,
            band_store_candidates_bounded,
        )

        store_dir, fn, data_sub = (
            str(BAND_PATH), band_store_candidates_bounded, BAND_DIR
        )
        row_bytes = 26  # band tinyint + 56-bit bhash + doc_id + hdr
    else:
        from dragnet_spark.index.fingerprints import (
            SRP_DIR,
            srp_store_candidates_bounded,
        )

        store_dir, fn, data_sub = (
            str(SRP_PATH), srp_store_candidates_bounded, SRP_DIR
        )
        row_bytes = 26
    n_rows = spark.read.parquet(os.path.join(store_dir, data_sub)).count()
    rec["n_store_rows"] = n_rows
    # both self-join sides exchange the full row set
    projection = 2 * n_rows * row_bytes
    rec["collision_exchange_projection_bytes"] = projection
    slices = max(4, min(64, -(-projection // DISCOVER_BUDGET)))
    rec["slices"] = int(slices)
    out = str(STORE_ROOT / f"{family}_cand_out")
    t0 = time.time()
    n_cand = fn(spark, store_dir, out, slices=int(slices)).count()
    rec["discover_s"] = round(time.time() - t0, 1)
    rec["n_candidates"] = n_cand
    rec["store_bytes"] = _du(store_dir)
    rec["free_after"] = _free()
    rec["cand_sink_bytes"] = _du(out)
    _update(lambda s: s["discovery"].__setitem__(family, rec))
    shutil.rmtree(out, ignore_errors=True)
    print(f"{family}: {n_cand} candidates in {rec['discover_s']}s "
          f"({slices} slices over {n_rows} store rows)")


def cmd_finalize() -> None:
    state = _load()
    folds = state["folds"]
    band_walls = [
        folds[k]["band_append_s"] for k in sorted(folds, key=int)
        if folds[k].get("band_append_s") is not None
    ]
    srp_walls = [
        folds[k]["srp_append_s"] for k in sorted(folds, key=int)
        if folds[k].get("srp_append_s") is not None
    ]
    state["summary"] = {
        "n_folds": len(band_walls),
        "docs_total": len(band_walls) * DOCS_PER_FOLD,
        "vectors_total": len(srp_walls) * VECS_PER_FOLD,
        "band_append_walls_s": band_walls,
        "srp_append_walls_s": srp_walls,
        "band_wall_max_over_min": (
            round(max(band_walls) / min(band_walls), 2)
            if band_walls else None
        ),
        "srp_wall_max_over_min": (
            round(max(srp_walls) / min(srp_walls), 2)
            if srp_walls else None
        ),
        # folds 0-1 overlapped unrelated dev activity on the box (and
        # fold 0 is the store BUILD); the steady-state series is the
        # honest flat-or-not evidence for the continuous-ingest claim
        "band_steady_state_walls_s": band_walls[2:],
        "band_steady_max_over_min": (
            round(max(band_walls[2:]) / min(band_walls[2:]), 2)
            if len(band_walls) > 3 else None
        ),
        "srp_steady_max_over_min": (
            round(max(srp_walls[2:]) / min(srp_walls[2:]), 2)
            if len(srp_walls) > 3 else None
        ),
        "final_band_store_bytes": (
            folds[max(folds, key=int)].get("band_store_bytes")
            if folds else None
        ),
        "final_srp_store_bytes": (
            folds[max(folds, key=int)].get("srp_store_bytes")
            if folds else None
        ),
    }
    state["declared_skips"] = [
        {
            "stage": "exact_verify",
            "reason": (
                "verify reads pair endpoints' text/vectors; the corpus "
                "is deleted by construction on this box (the tier is "
                "~118 GB of source parquet against <80 GB free — the "
                "STORAGE ceiling SCALE.md derives). On a cluster the "
                "same bounded slices (_verify_in_slices, "
                "manifest-guarded) read endpoints from the corpus's "
                "durable home; the verify machinery is graded "
                "bit-identical through the 10^4 tier "
                "(BENCH_SF10000.json store_amortized rows)."
            ),
        }
    ]
    _update(lambda s: (s.__setitem__("summary", state["summary"]),
                       s.__setitem__("declared_skips",
                                     state["declared_skips"])))
    print(json.dumps(state["summary"], indent=1))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    cmd = sys.argv[1]
    if cmd == "gen":
        cmd_gen(int(sys.argv[2]))
    elif cmd == "append":
        cmd_append(int(sys.argv[2]))
    elif cmd == "discover":
        cmd_discover(sys.argv[2])
    elif cmd == "finalize":
        cmd_finalize()
    else:
        print(__doc__)
        raise SystemExit(2)


if __name__ == "__main__":
    # Each ladder step runs as its own process (run_sf100000.sh), so
    # tear the JVM down at the PROCESS boundary — never inside cmd_*:
    # get_spark getOrCreate's the caller's session, and stopping it
    # from a library-driven call (the test suite drives cmd_* in
    # process) kills the shared SparkContext for everything after.
    try:
        main()
    finally:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
