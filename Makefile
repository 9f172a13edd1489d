# Build/test entry points (reference Makefile:83-116 equivalents).

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C minnow_c_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C minnow_c_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
