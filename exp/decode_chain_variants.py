"""Round-3 experiment: why does bench.py report 134 GB/s when chain-slope
timing of the same decode kernel says ~190 GB/s?

Hypothesis: bench.py's fori_loop carries the full 100 MB decoded array in
the loop carry ``(salt, x)``; XLA double-buffers loop carries, so every
iteration pays an extra 100 MB copy (read+write) on top of the decode --
8 B/elem of parasitic traffic vs the kernel's ~5.75 B/elem, i.e. a ~2.4x
traffic inflation, consistent with 190 -> 134.

Variants (all preserve the anti-elision salt chain -- each iteration's
salt derives from the previous iteration's decoded output, a true data
dependency through the opaque Pallas call):

  carry     -- production bench.py shape: fori_loop carry (salt, x)
  saltonly  -- fori_loop carries just the salt; one final decode after
               the loop produces the returned array
  unrolled  -- Python-unrolled chain (no loop carry at all)

Run on the real TPU:  python exp/decode_chain_variants.py [variant ...]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import decode_pallas, native
from minnow_c_tpu.ops import rng as _rng

LEVEL = 11
N = (25_000_000 // decode_pallas.TILE) * decode_pallas.TILE
W = 64.0
CHAIN = 128
UNROLL = 32


def main():
    sel = set(sys.argv[1:]) or {"carry", "saltonly", "unrolled"}
    rng = np.random.default_rng(0)
    bins = rng.integers(0, 1 << LEVEL, N, dtype=np.uint64).astype(np.uint32)
    packed = jax.device_put(jnp.asarray(native.uniform_pack_host(
        bins, LEVEL)))
    key = _rng.field_key_arr(1234, 0, 0)

    def one(words, s):
        return decode_pallas.decode_pallas(
            words, key ^ s, LEVEL, N, 0.0, W, W, periodic=True)

    def salt_of(x, i):
        return jax.lax.bitcast_convert_type(x[0], jnp.uint32) ^ \
            i.astype(jnp.uint32)

    @jax.jit
    def chain_carry(words, salt):
        def body(i, carry):
            s, _ = carry
            x = one(words, s)
            return (salt_of(x, i), x)
        _, x = jax.lax.fori_loop(
            0, CHAIN, body, (salt, jnp.zeros((N,), jnp.float32)))
        return x

    @jax.jit
    def chain_saltonly(words, salt):
        def body(i, s):
            return salt_of(one(words, s), i)
        s = jax.lax.fori_loop(0, CHAIN - 1, body, salt)
        return one(words, s)

    @jax.jit
    def chain_unrolled(words, salt):
        s = salt
        x = None
        for i in range(UNROLL):
            x = one(words, s)
            s = salt_of(x, jnp.uint32(i))
        return x

    cases = {
        "carry": (chain_carry, CHAIN),
        "saltonly": (chain_saltonly, CHAIN),
        "unrolled": (chain_unrolled, UNROLL),
    }
    for name in ("carry", "saltonly", "unrolled"):
        if name not in sel:
            continue
        fn, chain = cases[name]
        r = harness.run(lambda s, fn=fn: fn(packed, s),
                        bytes_per_iter=N * 4 * chain)
        print(f"{name:>9}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
