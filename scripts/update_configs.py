"""Bulk-edit per-task JSON configs (the reference ships this as
task_configs/monarch_roberta_glue/update_configs.ipynb -- a notebook that
adds / updates / removes one key across every task JSON in a directory).

Same semantics, as a CLI:
  - only files containing a "task_name" key are touched (skips
    hpo_budgets.json / labels.json style siblings),
  - `update` only rewrites the key where it already exists,
  - `add` sets it everywhere, `remove` deletes it (erroring loudly if a
    file lacks it, unlike the notebook's bare `del` -- same outcome),
  - values are parsed as JSON when possible so `--value 32` is an int and
    `--value '"str"'` / bare `--value str` is a string.

Usage:
  python scripts/update_configs.py task_configs/monarch_roberta_glue \
      --key output_dir --value results/monarch_roberta_glue --action update
  python scripts/update_configs.py task_configs/*_glue --key seed \
      --value 42 --action add --dry-run
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_value(raw: str):
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        return raw  # bare strings are the common case


def update_config(path: str, key: str, value, action: str,
                  dry_run: bool = False) -> list[str]:
    """Apply one key edit to every task JSON in ``path``; returns the list
    of files changed (reference notebook cell 1)."""
    assert action in ("add", "update", "remove"), action
    changed = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".json"):
            continue
        fpath = os.path.join(path, name)
        with open(fpath) as f:
            config = json.load(f)
        if "task_name" not in config:
            continue
        if action == "update":
            if key not in config:
                continue
            config[key] = value
        elif action == "add":
            config[key] = value
        else:
            if key not in config:
                print(f"  {fpath}: no key {key!r}, skipping", file=sys.stderr)
                continue
            del config[key]
        changed.append(fpath)
        if not dry_run:
            with open(fpath, "w") as f:
                json.dump(config, f, indent=4)
                f.write("\n")
    return changed


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("paths", nargs="+",
                    help="config directories (each scanned for *.json "
                         "containing a task_name key)")
    ap.add_argument("--key", required=True)
    ap.add_argument("--value", default=None,
                    help="JSON-parsed when possible (42 -> int, "
                         "true -> bool); required for add/update")
    ap.add_argument("--action", required=True,
                    choices=("add", "update", "remove"))
    ap.add_argument("--dry-run", action="store_true",
                    help="print what would change without writing")
    args = ap.parse_args(argv)
    if args.action in ("add", "update") and args.value is None:
        ap.error(f"--value is required for --action {args.action}")
    value = parse_value(args.value) if args.value is not None else None

    total = []
    for path in args.paths:
        if not os.path.isdir(path):
            ap.error(f"not a directory: {path}")
        total += update_config(path, args.key, value, args.action,
                               dry_run=args.dry_run)
    verb = "would change" if args.dry_run else "changed"
    print(f"{verb} {len(total)} file(s):")
    for f in total:
        print(f"  {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
