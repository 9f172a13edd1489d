"""Round-2 experiment: HBM-traffic ablation of the fused encode path.

The fused encode (ops/encode_pallas._encode_pallas) measures ~99-110 GB/s
while the pack kernel alone sustains ~200 GB/s.  Per-element traffic
analysis says the gap is extra materialized passes around the Pallas
call (the unwrapped plane feeding both the minmax reduction and the
scale pass, plus the mandatory `scaled` buffer the kernel reads):

  ideal two-pass bound (minmax read + pack read/write): ~9.75 B/elem
  production suspicion:  unwrap write + minmax read + scale read/write
                         + pack read/write: up to ~21.75 B/elem

This script times each stage in isolation plus a "recompute" variant
that duplicates the unwrap into both consumers behind optimization
barriers (trading VPU flops, which are free here, for one whole
materialized plane).  Wire parity of every candidate is asserted on
device before timing.  Run on the real TPU:

    python exp/encode_traffic.py [stage ...]
    stages: full minmax scale pack recompute noperiodic
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import encode_pallas, kernels

DEPTH = 14
W = 64.0
N = (1 << 19) * 48  # 25.2M elements = ~100 MB f32

_EXP2W = jnp.float32(np.float32(np.exp2(DEPTH, dtype=np.float64)))


@jax.jit
def minmax_pass(x, salt):
    u = kernels.undo_periodic(x + salt.astype(jnp.float32) * 0.0,
                              jnp.float32(W))
    return jnp.min(u), jnp.max(u)


@jax.jit
def scale_pass(x, x0, rng_v, salt):
    u = kernels.undo_periodic(x + salt.astype(jnp.float32) * 0.0,
                              jnp.float32(W))
    return (u - x0) / rng_v * _EXP2W


@jax.jit
def full_prod(x, salt):
    xs = x + salt.astype(jnp.float32) * jnp.float32(1e-12)
    return encode_pallas.encode_pallas(xs, DEPTH, periodic_width=W)[0]


@jax.jit
def full_noperiodic(x, salt):
    xs = x + salt.astype(jnp.float32) * jnp.float32(1e-12)
    return encode_pallas.encode_pallas(xs, DEPTH)[0]


@functools.partial(jax.jit, static_argnames=())
def full_recompute(x, salt):
    """Same wire bits as full_prod: undo_periodic is deterministic, so
    recomputing it for the scale pass cannot change the stream.  The
    barriers split x into two 'different' values so XLA cannot CSE the
    two unwraps back into one materialized buffer."""
    xs = x + salt.astype(jnp.float32) * jnp.float32(1e-12)
    box = jnp.float32(W)
    u1 = kernels.undo_periodic(jax.lax.optimization_barrier(xs), box)
    x0 = jnp.min(u1)
    rng_v = jnp.max(u1) - x0
    u2 = kernels.undo_periodic(jax.lax.optimization_barrier(xs), box)
    scaled = (u2 - x0) / rng_v * _EXP2W
    scaled = jax.lax.optimization_barrier(scaled)
    return encode_pallas.pack_pallas(scaled, DEPTH, N, from_f32=True)


UNROLL = 16


@jax.jit
def full_chain(x, salt):
    """UNROLL production encodes inside one jit, serialized by a true
    data dependency: each step's box width is W * (1 + salt * 1e-45).
    The perturbation rounds away in f32 (1 + 5.6e-36 == 1.0 exactly for
    any u32 salt), so every step does bit-identical wire work, yet each
    step's *inputs* are unique per call (the salt scalar differs), so no
    content-addressed replay is possible and no extra per-element salt
    pass inflates the measured traffic (the `xs = x + salt*1e-12` trick
    used by the single-shot cases costs a full HBM read+write per
    iteration, ~45% of the encode's own traffic)."""
    s = salt
    w = None
    for i in range(UNROLL):
        box = jnp.float32(W) * (jnp.float32(1.0) +
                                s.astype(jnp.float32) * jnp.float32(1e-45))
        w, _, _ = encode_pallas.encode_pallas(x, DEPTH, periodic_width=box)
        s = w[0] ^ jnp.uint32(i)
    return w


def main():
    sel = set(sys.argv[1:]) or {"full", "minmax", "scale", "pack",
                                "recompute", "noperiodic", "fullchain"}
    rng = np.random.default_rng(7)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, W, N).astype(np.float32)))
    zero = jnp.uint32(0)
    print("data on device", flush=True)

    # wire parity of the recompute variant (device-side compare)
    if "recompute" in sel:
        want = full_prod(x, zero)
        got = full_recompute(x, zero)
        nbad = int(jax.jit(lambda a, b: jnp.sum((a != b).astype(
            jnp.int32)))(want, got))
        print(f"recompute wire parity: {nbad == 0} (bad words {nbad})",
              flush=True)

    x0, x1 = (jnp.float32(float(v)) for v in minmax_pass(x, zero))
    rng_v = x1 - x0
    scaled = jax.block_until_ready(scale_pass(x, x0, rng_v, zero))

    cases = {
        "minmax": (lambda s: minmax_pass(x, s), N * 4),
        "scale": (lambda s: scale_pass(x, x0, rng_v, s), N * 4),
        "pack": (lambda s: encode_pallas.pack_pallas(
            scaled + s.astype(jnp.float32) * 0.0, DEPTH, N,
            from_f32=True), N * 4),
        "full": (lambda s: full_prod(x, s), N * 4),
        "noperiodic": (lambda s: full_noperiodic(x, s), N * 4),
        "recompute": (lambda s: full_recompute(x, s), N * 4),
        "fullchain": (lambda s: full_chain(x, s), N * 4 * UNROLL),
    }
    for name in ("minmax", "scale", "pack", "noperiodic", "full",
                 "recompute", "fullchain"):
        if name not in sel:
            continue
        fn, nbytes = cases[name]
        r = harness.run(fn, bytes_per_iter=nbytes)
        print(f"{name:>10}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
