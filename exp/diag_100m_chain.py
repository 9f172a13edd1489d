"""Round-3 diagnosis: why does the 100M-particle encode chain measure
~20 GB/s when the identical rows pipeline measures 58 (div) / 118
(recip) GB/s at 100 MB?

Hypotheses: (a) the salt_perturb pass (3 broadcasted iotas over the
1.2 GB buffer + xor + bitcasts) fails to fuse and multiplies traffic;
(b) sheer scale (buffer pressure at 1.2 GB inputs).

This times the SAME SPMD program content as
ShardedPositionCodec._encode (vmapped _float_block_encode /
_float_block_stats + the rows pack) at the full 100M scale, with the
salt injected through the zero-traffic box-width perturbation
(W * (1 + s*1e-45) == W exactly in f32) -- vs the salt_perturb variant.

Run on the real TPU:  python exp/diag_100m_chain.py [div|recip|perturb]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.parallel.sharding import (_float_block_encode,
                                            _float_block_stats,
                                            _float_rows_encode_recip,
                                            _pack_rows_folded)

W = 64.0
DEPTH = 16
B, nb = 8, 12_500_000
CHAIN = 8


def main():
    sel = set(sys.argv[1:]) or {"div", "recip", "perturb"}
    rng = np.random.default_rng(7)
    xd = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (B, 3, nb)).astype(np.float32)))
    raw = B * 3 * nb * 4

    def boxsalt(s):
        return jnp.float32(W) * (jnp.float32(1.0) +
                                 s.astype(jnp.float32) * jnp.float32(1e-45))

    @jax.jit
    def chain_div(xin, salt):
        s = salt
        w = None
        for i in range(CHAIN):
            boxs = boxsalt(s)
            bins, x0s, rngs = jax.vmap(
                lambda xb: _float_block_encode(xb, DEPTH, boxs))(xin)
            w = _pack_rows_folded(bins, DEPTH, True)
            s = w[0, 0, 0] ^ jnp.uint32(i)
        return w

    @jax.jit
    def chain_recip(xin, salt):
        s = salt
        w = None
        for i in range(CHAIN):
            boxs = boxsalt(s)
            x0s, rngs = jax.vmap(
                lambda xb: _float_block_stats(xb, boxs))(xin)
            w = _float_rows_encode_recip(xin, x0s, rngs, DEPTH, boxs,
                                         True, False)
            s = w[0, 0, 0] ^ jnp.uint32(i)
        return w

    @jax.jit
    def chain_perturb(xin, salt):
        from bench_all import salt_perturb
        s = salt
        w = None
        m = jnp.uint32(0x3FFFFF)
        for i in range(CHAIN):
            xs = salt_perturb(xin, [(0, s & m),
                                    (1, (s >> jnp.uint32(10)) & m)])
            bins, x0s, rngs = jax.vmap(
                lambda xb: _float_block_encode(xb, DEPTH,
                                               jnp.float32(W)))(xs)
            w = _pack_rows_folded(bins, DEPTH, True)
            s = w[0, 0, 0] ^ jnp.uint32(i)
        return w

    cases = {"div": chain_div, "recip": chain_recip,
             "perturb": chain_perturb}
    for name in ("div", "recip", "perturb"):
        if name not in sel:
            continue
        fn = cases[name]
        r = harness.run(lambda s, fn=fn: fn(xd, s),
                        bytes_per_iter=raw * CHAIN)
        print(f"{name:>8}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
