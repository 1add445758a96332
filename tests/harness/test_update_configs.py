"""scripts/update_configs.py -- bulk task-JSON editing (reference
task_configs/monarch_roberta_glue/update_configs.ipynb)."""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
SCRIPT = os.path.join(ROOT, "scripts", "update_configs.py")


def _setup(tmp_path):
    (tmp_path / "cola.json").write_text(json.dumps(
        {"task_name": "cola", "lr": 1e-4, "output_dir": "old"}))
    (tmp_path / "mrpc.json").write_text(json.dumps(
        {"task_name": "mrpc", "lr": 2e-4}))
    # no task_name -> must be skipped (the notebook's guard)
    (tmp_path / "hpo_budgets.json").write_text(json.dumps({"cola": 3}))
    return tmp_path


def _run(*args):
    return subprocess.run([sys.executable, SCRIPT, *args],
                          capture_output=True, text=True)


def test_update_only_touches_existing_key(tmp_path):
    d = _setup(tmp_path)
    p = _run(str(d), "--key", "output_dir", "--value", "new",
             "--action", "update")
    assert p.returncode == 0, p.stderr
    assert json.loads((d / "cola.json").read_text())["output_dir"] == "new"
    assert "output_dir" not in json.loads((d / "mrpc.json").read_text())
    assert json.loads((d / "hpo_budgets.json").read_text()) == {"cola": 3}


def test_add_remove_and_json_value_parsing(tmp_path):
    d = _setup(tmp_path)
    p = _run(str(d), "--key", "seed", "--value", "42", "--action", "add")
    assert p.returncode == 0, p.stderr
    for f in ("cola.json", "mrpc.json"):
        assert json.loads((d / f).read_text())["seed"] == 42  # int, not str
    p = _run(str(d), "--key", "lr", "--action", "remove")
    assert p.returncode == 0, p.stderr
    assert "lr" not in json.loads((d / "cola.json").read_text())


def test_dry_run_writes_nothing(tmp_path):
    d = _setup(tmp_path)
    before = (d / "cola.json").read_text()
    p = _run(str(d), "--key", "lr", "--value", "9", "--action", "update",
             "--dry-run")
    assert p.returncode == 0 and "would change" in p.stdout
    assert (d / "cola.json").read_text() == before
