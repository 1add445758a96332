#!/usr/bin/env bash
# On-chip CoLA ASHA smoke sweep -- the committed HPO fidelity artifact
# (results/hpo_cola/{best_hyperparams.json,hpo_state.jsonl}).
#
# Mirrors the reference's Ray Tune block (reference run_glue.py:663-686)
# at smoke scale: n_trials=8, parallel_trials=2 (two trial threads
# contending for the one real chip -- the Ray-placement equivalent),
# compressed epoch budget (ASHA rungs from task_configs/hpo_budgets.json
# capped at 4 epochs), synthetic learnable smoke data (zero-egress
# sandbox).  --resume=True turns on the crash-resumable hpo_state.jsonl.
#
# Run:  bash scripts/run_hpo_cola_chip.sh
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=results/hpo_cola
mkdir -p "$OUT"
# --tune_lr_scale + --tune_grace: the synthetic smoke corpus needs ~20x the
# real-data lr space to move inside the compressed budget, so the sweep
# can actually discriminate trials (all-zero matthews otherwise);
# real-data sweeps keep the default 1.0 (reference-space parity).
timeout 3000 python run_glue.py task_configs/monarch_roberta_glue/cola.json \
  --smoke=True --output_dir="$OUT/" --save_steps=0 --eval_steps=0 \
  --logging_steps=0 --load_best_model_at_end=False \
  --do_tune=True --n_trials=8 --parallel_trials=2 --resume=True \
  --num_train_epochs=8 --tune_lr_scale=20 --tune_grace=5

# keep only the two artifacts (trial dirs hold per-trial checkpoints)
ls -la "$OUT/cola/best_hyperparams.json" "$OUT/cola/hpo_state.jsonl"
