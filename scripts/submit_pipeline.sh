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
spark-submit \
  --master "local[$CORES]" \
  --driver-memory "${DRIVER_MEM:-48g}" \
  --py-files "$REPO/dist/netbase_spark.zip" \
  run_pipeline.py --from-submit --cpus "$CORES" --docs "$DOCS" "$@"
