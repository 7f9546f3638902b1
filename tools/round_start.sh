#!/usr/bin/env bash
# Round-start ritual: the driver regenerates /root/testdata between
# rounds, so (a) the previous round's CORRECTNESS file proves nothing
# about the CURRENT parquet bytes and (b) the first bench run of the
# round is page-cache-cold. Run the full-registry oracle gate at
# sf0.01 before touching anything else; it doubles as the cache warmer.
#
#   bash tools/round_start.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
echo "== full-registry oracle gate @ ${SF_DIR} =="
python tools/check_correctness.py "${SF_DIR}"
echo "== pytest (default tier, 5-way sharded — tools/fast_gate.sh) =="
bash tools/fast_gate.sh
echo "== pytest (slow tier: hammers, chains, crash matrices) =="
python -m pytest tests/ -x -q -m slow
