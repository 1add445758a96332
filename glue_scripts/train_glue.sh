#!/usr/bin/env bash
# Train one GLUE task with Monarch adapters (reference glue_scripts/train_glue.sh).
# Usage: bash glue_scripts/train_glue.sh <task> [extra --key=value args...]
set -e
TASK=${1:-cola}
shift || true
python run_glue.py "task_configs/monarch_roberta_glue/${TASK}.json" "$@"
