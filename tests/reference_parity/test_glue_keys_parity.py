"""GLUE sentence-key mapping parity vs the reference's task_to_keys.

Wrong sentence keys silently train on the wrong columns; the mapping is
extracted by ast from the reference's src/hf_setup.py and compared
verbatim.
"""

import ast

from sparse_matrix_fine_tuning_tpu.data.glue import TASK_TO_KEYS


def test_task_to_keys_matches_reference():
    tree = ast.parse(open("/root/reference/src/hf_setup.py").read())
    node = next(
        n for n in tree.body
        if isinstance(n, ast.Assign)
        and any(getattr(t, "id", None) == "task_to_keys" for t in n.targets))
    ref = ast.literal_eval(node.value)
    assert dict(TASK_TO_KEYS) == ref
