#!/usr/bin/env bash
# Regenerate the committed 7B-execution artifact (results/exp_7b_execution.jsonl)
# from single-config runs of scripts/exp_7b_execution.py: the two
# shape-isolation configs, the device-initialised full 7B (expected
# ResourceExhausted -- the root-cause demonstration), and the flagship
# QUANT_HOST=1 full 7B that trains.  Each config runs in a fresh process;
# the child's one-line JSON record is appended with its label.
#
# The full boundary search (20L/23L/26L rows in docs/BENCHMARKS.md) is in
# scripts/exp_7b_execution.py drive(); this script re-measures only the
# configs the docs' conclusions rest on, to bound TPU time.
set -u
cd "$(dirname "$0")/.."
OUT=results/exp_7b_execution.jsonl
mkdir -p results
: > "$OUT"

run_cfg() { # label layers hidden inter [QUANT_HOST [BS SEQ STEPS]]
  local label=$1 layers=$2 hidden=$3 inter=$4 qh=${5:-}
  local bs=${6:-1} seq=${7:-256} steps=${8:-4}
  echo "=== $label ===" >&2
  local out
  out=$(QUANT_HOST=$qh LAYERS=$layers HIDDEN=$hidden INTER=$inter \
        BS=$bs SEQ=$seq STEPS=$steps \
        timeout 2400 python -u scripts/exp_7b_execution.py 2>&1)
  local rc=$?
  echo "$out" | tail -3 >&2
  echo "$out" | python -c "
import json, sys
rec = None
for line in sys.stdin:
    if line.startswith('{'):
        rec = json.loads(line)
if rec is None:
    rec = {'executed': False, 'error': 'no record (hang/timeout rc=$rc)'}
rec = {'label': '$label', **rec, 'rc': $rc}
print(json.dumps(rec))" >> "$OUT"
}

run_cfg "width-isolation (7B width, 8L)" 8 4096 11008
run_cfg "depth-isolation (32L, half width)" 32 2048 5504
run_cfg "full 7B (device-init, expected OOM)" 32 4096 11008
run_cfg "full 7B (QUANT_HOST=1)" 32 4096 11008 1
# flagship throughput: fills the HBM freed by state_split (bs1 x seq256
# left ~10 GB idle at 36.6% MFU); bs4 x seq512 fails REMOTE COMPILE on
# this tunnel (HTTP 500, reproduced twice), bs2 x seq512 is the largest
# compiling config and reaches >=50% MFU with a 20-step loss curve
run_cfg "flagship throughput (QUANT_HOST=1, bs2 x seq512, 20 steps)" \
        32 4096 11008 1 2 512 20
echo "wrote $OUT" >&2
cat "$OUT"
