# Test tiers (VERDICT r2 #5): `make test-fast` is the quick gate for every
# change; `make test` runs the full suite including harness smokes /
# multi-epoch trainers / virtual-mesh runs.
#
# Measured WARM (shared jit disk cache populated) on the sandbox's single
# CPU core (2026-08-19, all green):
#   test-fast  226 passed in 2:10
#   test-slow  225 passed in 13:13 (while sharing the core with a TPU
#              bench; ~6-8 min on an idle core)
# Cold-cache runs are several times slower (every jit compiles once); on a
# multi-core box use `make test-par` (pytest-xdist), which shares the same
# disk cache across workers.
# tests/conftest.py persists EVERY jit compile to a shared disk cache
# (min_compile_time 0), and the suite builds each tiny model once per
# process, handing tests buffer-deep copies (utils/testing.fresh_model).

.PHONY: test test-fast test-slow test-par bench

test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

test:
	python -m pytest tests/ -q

# parallel full suite for multi-core boxes; workers share the compile cache
test-par:
	python -m pytest tests/ -q -n auto

bench:
	python bench.py
