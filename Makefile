# Developer entry points (ops/CI parity with the reference Makefile,
# /root/reference/Makefile:11-49, minus the git/DVC coupling).

.PHONY: pytest pytest-serial pytest-fast pytest-unit pytest-tier2 pytest-docker-build \
	pytest-docker bench native clean-native scaling lint

PYTEST_WORKERS ?= 8

pytest:
	python -m pytest tests/ -q -n $(PYTEST_WORKERS) --dist loadfile

pytest-serial:
	python -m pytest tests/ -q

pytest-fast:
	python -m pytest tests/ -q -x -n $(PYTEST_WORKERS) --dist loadfile

pytest-unit:
	python -m pytest tests/ -q -m "not tier2"

pytest-tier2:
	python -m pytest tests/ -q -m tier2

# Containerized tier-2 run (reference: make pytest-docker-*,
# /root/reference/Makefile:13-21)
pytest-docker-build:
	docker build -t dmd-era5-tpu-repo -f Dockerfile.repo .
	docker build -t dmd-era5-tpu-pytest -f Dockerfile.pytest .

pytest-docker: pytest-docker-build
	docker run --rm dmd-era5-tpu-pytest

bench:
	python bench.py

native:
	$(MAKE) -C dmd_era5_tpu/native

clean-native:
	$(MAKE) -C dmd_era5_tpu/native clean

scaling:
	python scripts/scaling_bench.py

lint:
	python -m compileall -q dmd_era5_tpu tests bench.py __graft_entry__.py
	@if python -c "import ruff" 2>/dev/null; then \
	  python -m ruff check dmd_era5_tpu tests bench.py __graft_entry__.py; \
	else echo "ruff not installed locally; enforced in CI"; fi
	@if python -c "import mypy" 2>/dev/null; then \
	  python -m mypy dmd_era5_tpu; \
	else echo "mypy not installed locally; enforced in CI"; fi
