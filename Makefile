test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-scaling:
	python scripts/bench_scaling.py

tutorial:
	python examples/tutorial.py

.PHONY: test bench bench-scaling tutorial
