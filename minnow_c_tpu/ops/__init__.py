"""L1 kernel library: jittable array kernels + native host stages."""

from . import bitpack, checksum, entropy, kernels, native, rng  # noqa: F401
