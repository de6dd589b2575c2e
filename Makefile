# Developer entry points (parity: reference Makefile targets, but tests/
# actually exists here).

.PHONY: test quick-start complete-system bench sim proto lint clean

test:
	python -m pytest tests/ -q

quick-start:
	python scripts/quick_start.py

complete-system:
	python scripts/test_complete_system.py

bench:
	python bench.py

sim:
	python -m fl_tpu.orchestration.simulation --clients 5 --rounds 10

proto:
	python scripts/deploy.py proto

check-env:
	python scripts/deploy.py check

clean:
	rm -rf .pytest_cache .jax_cache **/__pycache__
