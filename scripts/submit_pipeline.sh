#!/usr/bin/env bash
# Run the KG-construction pipeline via `spark-submit --py-files`, the
# north rule's cluster run mode.  Builds dist/netbase_spark.zip and
# launches from a scratch directory OUTSIDE the repo, so the package can
# reach the driver and the Python UDF workers ONLY through --py-files —
# exactly what a multi-executor cluster submission exercises.
#
# Usage: scripts/submit_pipeline.sh [cores] [docs] [extra run_pipeline args...]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${1:-8}"
DOCS="${2:-2000}"
shift $(( $# > 2 ? 2 : $# ))

mkdir -p "$REPO/dist"
rm -f "$REPO/dist/netbase_spark.zip"
(cd "$REPO" && zip -qr dist/netbase_spark.zip netbase_spark -x '*__pycache__*')

WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cp "$REPO/scripts/run_pipeline.py" "$WORK/"

cd "$WORK"
# optional per-stage task evidence: EVLOG_DIR=... enables the Spark
# event log (parsed by bench_skew_scaling.py for straggler histograms)
EXTRA_CONF=()
if [[ -n "${EVLOG_DIR:-}" ]]; then
  mkdir -p "$EVLOG_DIR"
  EXTRA_CONF+=(--conf spark.eventLog.enabled=true
               --conf spark.eventLog.compress=false
               --conf "spark.eventLog.dir=file://$EVLOG_DIR")
fi
spark-submit \
  --master "local[$CORES]" \
  --driver-memory "${DRIVER_MEM:-48g}" \
  --py-files "$REPO/dist/netbase_spark.zip" \
  "${EXTRA_CONF[@]}" \
  run_pipeline.py --from-submit --cpus "$CORES" --docs "$DOCS" "$@"
