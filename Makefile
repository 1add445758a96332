# Test tiers (VERDICT r2 #5): `make test-fast` is the quick gate for every
# change (<~3 min on an uncontended box); `make test` runs the full suite
# including harness smokes / multi-epoch trainers / virtual-mesh runs.

.PHONY: test test-fast test-slow bench

test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

test:
	python -m pytest tests/ -q

bench:
	python bench.py
