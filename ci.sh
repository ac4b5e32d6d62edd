#!/usr/bin/env bash
# CI entrypoint, mirroring the reference's unit/integration split
# (/root/reference/ci/test_python_espnet2.sh + test_integration_espnet2.sh):
#   ./ci.sh smoke       - fast core-spine unit tests (target <= 2 min)
#   ./ci.sh integration - mini_an4 end-to-end recipe (data -> train -> decode)
#   ./ci.sh full        - the whole unit suite (nightly tier)
set -euo pipefail
cd "$(dirname "$0")"

mode="${1:-smoke}"

case "$mode" in
  smoke)
    python -m pytest tests/ -m smoke -q -x
    ;;
  integration)
    python egs/mini_an4/asr1/run.py --max_epoch 2 --device cpu
    ;;
  full)
    python -m pytest tests/ -q
    ;;
  *)
    echo "usage: $0 [smoke|integration|full]" >&2
    exit 2
    ;;
esac
