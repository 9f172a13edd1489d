"""Deterministic random number generation for decode dithering.

Two generators live here:

1. ``Xoroshiro128Plus`` -- a numpy, bit-exact replica of the reference RNG
   (``src/rand.c``: splitmix64 seeding rand.c:114-121, xoroshiro128+ step
   with rotl constants 55/14/36 rand.c:80-90, the 2^64 jump rand.c:96-112,
   24-bit-mantissa uniform floats rand.c:60-64, rejection-sampled bounded
   ints rand.c:45-58).  Host-side utility kept for parity with the
   reference's RNG contract -- ``seed(seed, n)`` produces n non-overlapping
   streams for parallel decode, exactly like ``rand_Seed``.

2. ``uniform24`` -- the TPU-native dither source: counter-based
   (jax.random threefry) so it is stateless, order-independent, and
   identical on CPU and TPU backends.  The reference seeds its decode dither
   from ``clock()`` (quant.c:639), which makes decode nondeterministic; we
   instead carry a seed in the stream header and derive per-field,
   per-element randomness by key folding.  This is a deliberate, documented
   divergence (SURVEY.md "known reference defects").

Both produce floats of the same form as ``rand_Float``: a 24-bit integer
scaled by 2^-24, giving uniform [0, 1) values exactly representable in f32.
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint64(k)
    return (x << k) | (x >> (np.uint64(64) - k))


def splitmix64(state: int, n: int) -> np.ndarray:
    """Generate n splitmix64 outputs, advancing from ``state``
    (rand.c:114-121)."""
    out = np.empty(n, dtype=np.uint64)
    s = np.uint64(state)
    inc = np.uint64(0x9E3779B97F4A7C15)
    m1 = np.uint64(0xBF58476D1CE4E5B9)
    m2 = np.uint64(0x94D049BB133111EB)
    with np.errstate(over="ignore"):
        for i in range(n):
            s = s + inc
            z = s
            z = (z ^ (z >> np.uint64(30))) * m1
            z = (z ^ (z >> np.uint64(27))) * m2
            out[i] = z ^ (z >> np.uint64(31))
    return out


class Xoroshiro128Plus:
    """Vectorized xoroshiro128+ over n parallel streams.

    ``Xoroshiro128Plus(seed, n)`` matches ``rand_Seed(seed, n)``
    (rand.c:22-39): stream 0 is splitmix64-seeded, stream i is stream i-1
    jumped forward 2^64 steps.
    """

    _JUMP = (np.uint64(0xBEAC0467EBA5FACB), np.uint64(0xD86B048B86AA9922))

    def __init__(self, seed: int, n: int = 1):
        s = splitmix64(seed, 2)
        self.s0 = np.empty(n, dtype=np.uint64)
        self.s1 = np.empty(n, dtype=np.uint64)
        self.s0[0], self.s1[0] = s[0], s[1]
        for i in range(1, n):
            self.s0[i], self.s1[i] = self.s0[i - 1], self.s1[i - 1]
            self._jump_one(i)

    def _jump_one(self, i: int) -> None:
        """Advance stream i by 2^64 steps (xorshiftJump, rand.c:96-112)."""
        j0 = np.uint64(0)
        j1 = np.uint64(0)
        one = np.uint64(1)
        for jump in self._JUMP:
            for b in range(64):
                if jump & (one << np.uint64(b)):
                    j0 ^= self.s0[i]
                    j1 ^= self.s1[i]
                self._next_one(i)
        self.s0[i], self.s1[i] = j0, j1

    def _next_one(self, i: int) -> np.uint64:
        s0, s1 = self.s0[i], self.s1[i]
        with np.errstate(over="ignore"):
            result = s0 + s1
            s1 = s1 ^ s0
            self.s0[i] = _rotl(s0, 55) ^ s1 ^ ((s1 << np.uint64(14)) & _MASK64)
            self.s1[i] = _rotl(s1, 36)
        return result

    def next_u64(self) -> np.ndarray:
        """One xoroshiro128+ step on every stream (xorshiftNext,
        rand.c:80-90).  Returns shape (n,) uint64."""
        s0, s1 = self.s0, self.s1
        with np.errstate(over="ignore"):
            result = s0 + s1
            s1 = s1 ^ s0
            self.s0 = _rotl(s0, 55) ^ s1 ^ ((s1 << np.uint64(14)) & _MASK64)
            self.s1 = _rotl(s1, 36)
        return result

    def uint64(self, count: int) -> np.ndarray:
        """Draw ``count`` values from stream 0 (single-stream convenience)."""
        assert self.s0.shape[0] == 1
        out = np.empty(count, dtype=np.uint64)
        for i in range(count):
            out[i] = self.next_u64()[0]
        return out

    def floats(self, count: int) -> np.ndarray:
        """24-bit-mantissa uniforms in [0, 1) from stream 0
        (rand_Float, rand.c:60-64)."""
        bits = self.uint64(count) & np.uint64(0xFFFFFF)
        return (bits.astype(np.float32) / np.float32(1 << 24))

    def uint63_lim(self, lim: int) -> int:
        """Rejection-sampled bounded draw (rand_Uint63Lim, rand.c:45-58)."""
        lim_u = np.uint64(lim)
        high = np.uint64(1) << np.uint64(63)
        mask = ~high & _MASK64
        with np.errstate(over="ignore"):
            max_v = high - np.uint64(1) - high % lim_u
        v = self.next_u64()[0] & mask
        while v > max_v:
            v = self.next_u64()[0] & mask
        return int(v % lim_u)

    def bool_(self) -> bool:
        """rand_Bool (rand.c:66-68) -- note the reference tests bit 1."""
        return bool(self.next_u64()[0] & np.uint64(2))


# ---------------------------------------------------------------------------
# TPU-native counter-based dither
# ---------------------------------------------------------------------------

def make_key(seed: int):
    """Root key for a segment's dither randomness."""
    import jax
    return jax.random.key(seed)


def field_key(seed: int, field_index: int, dim: int = 0):
    """Derive the per-field, per-dimension dither key.  Folding (rather than
    sequential stream consumption) is the TPU replacement for the
    reference's jump-separated streams (rand.c:93-96): any field/dim/block
    can be decoded independently and reproducibly."""
    import jax
    k = jax.random.key(seed)
    k = jax.random.fold_in(k, field_index)
    return jax.random.fold_in(k, dim)


def uniform24(key, shape):
    """Uniform [0, 1) with 24-bit granularity, exactly representable in f32
    -- same value structure as rand_Float (rand.c:60-64) but counter-based.

    Returns f32.  Deterministic and identical across CPU/TPU backends
    because it is pure integer work plus an exact int->f32 conversion.
    """
    import jax
    import jax.numpy as jnp
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return (bits & jnp.uint32(0xFFFFFF)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))
