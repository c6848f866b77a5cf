#!/bin/bash
# Pipelined driver for the 10^5 store-amortized run: generate fold
# i+1 (DuckDB, 16 threads) WHILE appending fold i (Spark); every step
# is its own process and resumes from BENCH_SF100000_STORE.json, so
# re-running this script after any crash continues where it stopped.
set -u
cd "$(dirname "$0")/.."
LOG=.stores_sf100000/run.log
export DRAGNET_DRIVER_MEM=64g
mkdir -p .stores_sf100000
exec >>"$LOG" 2>&1
echo "=== run_sf100000 $(date -u +%FT%TZ) ==="
FOLDS=10
python tools/bench_sf100000_store.py gen 0 || exit 1
for ((i=0; i<FOLDS; i++)); do
  next=$((i+1))
  if (( next < FOLDS )); then
    python tools/bench_sf100000_store.py gen $next &
    GENPID=$!
  else
    GENPID=
  fi
  python tools/bench_sf100000_store.py append $i || { [ -n "$GENPID" ] && wait $GENPID; exit 1; }
  if [ -n "$GENPID" ]; then wait $GENPID || exit 1; fi
done
python tools/bench_sf100000_store.py discover minhash || exit 1
# free the band store before the SRP discovery shuffle
python - <<'PY'
import json, shutil
from pathlib import Path
root = Path(".")
art = root / "BENCH_SF100000_STORE.json"
state = json.load(art.open())
state.setdefault("notes", []).append(
    "band store deleted after its discovery to free ~35 GB for the "
    "SRP discovery shuffle (store bytes recorded in discovery.minhash)")
json.dump(state, art.open("w"), indent=1)
shutil.rmtree(".stores_sf100000/minhash_band", ignore_errors=True)
PY
python tools/bench_sf100000_store.py discover srp || exit 1
python tools/bench_sf100000_store.py finalize
echo "=== done $(date -u +%FT%TZ) ==="
