# Developer entry points (ops/CI parity with the reference Makefile,
# /root/reference/Makefile:11-49, minus the git/DVC coupling).

.PHONY: pytest pytest-fast bench native clean-native scaling lint

pytest:
	python -m pytest tests/ -q

pytest-fast:
	python -m pytest tests/ -q -x

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
