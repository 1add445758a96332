"""List best hyperparameters across result directories (the reference's
show_hp.ipynb equivalent): walks results/ for best_hyperparams.json and
hpo_state.jsonl and prints a table."""

import json
import os
import sys


def main(root="results"):
    rows = []
    for dirpath, _, files in os.walk(root):
        if "best_hyperparams.json" in files:
            with open(os.path.join(dirpath, "best_hyperparams.json")) as f:
                hp = json.load(f)
            rows.append((os.path.relpath(dirpath, root), hp))
    if not rows:
        print(f"no best_hyperparams.json under {root}/")
        return
    for name, hp in sorted(rows):
        print(f"{name:40s} {json.dumps(hp)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results")
