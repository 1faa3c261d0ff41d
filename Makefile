# Developer entry points.  The TPU chip is exclusive: never run two
# TPU-holding targets at once.

.PHONY: warm-bench bench test test-fast native

# Run after ANY kernel/model/config change that alters compiled HLO: the
# driver invokes `python bench.py` with a wall-clock budget, and a cold
# persistent-compile cache (.jax_cache/) is what timed out round 2's bench
# (BENCH_r02.json rc=124).  One warm run repopulates the cache.
warm-bench:
	python bench.py

bench:
	python bench.py

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

test:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C native
