# Build/test entry points (reference Makefile:83-116 equivalents).

.PHONY: all native test tpu-test bench clean

all: native

native:
	$(MAKE) -C minnow_c_tpu/native

test: native
	python -m pytest tests/ -q

# On-chip parity gate (XLA-vs-Pallas bits, frozen digests, dither
# vector); writes TPU_SMOKE.json.  Never run two TPU processes at once.
tpu-test: native
	python tpu_smoke.py

bench: native
	python bench.py

clean:
	$(MAKE) -C minnow_c_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
