#!/usr/bin/env bash
# MoReFT GLUE: classification through the ReFT wrapper with MoRe
# interventions on RoBERTa block outputs (reference loreft/moreft_glue.sh:
# -task glue -train_dataset cola -type MoReIntervention -p f1 r=1,
# bs 32, lr 3e-4, 12 epochs, --allow_cls_grad).
set -e
TASK=${1:-cola}
[ $# -ge 1 ] && shift
python run_reasoning.py -task glue -train_dataset "$TASK" \
  -p f1 -e 12 -lr 3e-4 -rank 1 -batch_size 32 -eval_batch_size 32 \
  -gradient_accumulation_steps 1 -max_length 256 \
  --intervention_type=MoReIntervention --dropout=0.05 \
  --weight_decay=0.0 --warmup_ratio=0.09 --logging_steps=20 \
  -allow_cls_grad -test_split validation "$@"
