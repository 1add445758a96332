# Test tiers (VERDICT r2 #5): `make test-fast` is the quick gate for every
# change; `make test` runs the full suite including harness smokes /
# multi-epoch trainers / virtual-mesh runs.
#
# Measured on the sandbox's single CPU core (2026-08-17, all green):
#   test-fast  212 passed in 6:16  (cold jit cache; repeats ~1/3 faster --
#              tests/conftest.py enables a persistent compilation cache)
#   test-slow   70 passed in 15:48
# On a normal multi-core box both tiers are several times faster (the
# suite is jit-compile dominated).

.PHONY: test test-fast test-slow bench

test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m "slow"

test:
	python -m pytest tests/ -q

bench:
	python bench.py
