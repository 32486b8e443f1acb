#!/usr/bin/env bash
# Single-host run wrapper (reference analog: files/run_scripts/runlocal.sh —
# its `./runlocal N [targets]` becomes `./runlocal.sh [pav-tpu args...]`).
# Runs the engine from this checkout without installing.
set -euo pipefail
cd "$(dirname "$0")"
exec python -m pav_tpu "$@"
