#!/usr/bin/env bash
# Train ALL GLUE tasks + zip the test-set TSVs for leaderboard submission
# (reference glue_scripts/train_glue.sh incl. the final zip step).
# Usage: bash glue_scripts/train_glue_all.sh [--output_dir=results/glue ...]
set -e
OUT=results/monarch_roberta_glue
# per-task output dirs: checkpoints / completed markers / best-HP state of
# different tasks must never share a directory (heads differ in shape and
# --resume / --do_tune read state from output_dir)
for TASK in cola sst2 mrpc qnli rte stsb qqp mnli; do
    python run_glue.py "task_configs/monarch_roberta_glue/${TASK}.json" \
        --do_predict=True --output_dir="$OUT/$TASK" "$@"
done
# collect every predicted TSV into one submission archive
find "$OUT" -maxdepth 3 -name "*.tsv" | zip -j "$OUT/glue_submit.zip" -@ \
    || python - "$OUT" <<'PY'
import os, sys, zipfile
out = sys.argv[1]
with zipfile.ZipFile(os.path.join(out, "glue_submit.zip"), "w") as z:
    for root, _, files in os.walk(out):
        for f in files:
            if f.endswith(".tsv"):
                z.write(os.path.join(root, f), f)
print("glue_submit.zip written")
PY
echo "Zipped TSVs in $OUT/glue_submit.zip. Ready for submission."
