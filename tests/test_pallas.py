"""Pallas fused-decode kernel tests (interpreter mode on CPU): bit-exact
equivalence with the XLA fast path, including ragged tails."""

import numpy as np
import pytest

import jax.numpy as jnp

from minnow_c_tpu.ops import bitpack, decode_pallas, fastpath, native
from minnow_c_tpu.ops import rng as _rng


SMALL = decode_pallas._TILE_CASCADE[-1]  # smallest kernel tile


@pytest.mark.parametrize("n_extra", [0, 4096])
@pytest.mark.parametrize("width", [1, 11, 16, 24])
def test_pallas_matches_xla(width, n_extra):
    n = SMALL + n_extra
    rng = np.random.default_rng(width)
    bins = rng.integers(0, 1 << width, n, dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(native.uniform_pack_host(bins, width))
    key = _rng.field_key_arr(9, 1, 2)
    ref = np.asarray(fastpath.fast_uniform_decode(
        words, key, width, n, 1.5, 32.0, periodic_width=64.0))
    got = np.asarray(decode_pallas.decode_pallas(
        words, key, width, n, 1.5, 32.0, 64.0, periodic=True,
        interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("width", [1, 14, 24])
def test_pallas_rows_matches_per_row(width):
    """decode_pallas_rows row r == decode_pallas(words[r]) bit-for-bit,
    including a 32-aligned but non-TILE-multiple element count."""
    n = SMALL + 64
    R = 4
    rng = np.random.default_rng(width)
    bins = rng.integers(0, 1 << width, (R, n),
                        dtype=np.uint64).astype(np.uint32)
    words = np.stack([native.uniform_pack_host(b, width) for b in bins])
    keys = np.stack([np.asarray(_rng.field_key_arr(9, r, 0))
                     for r in range(R)]).astype(np.uint32)
    x0 = np.linspace(0.0, 3.0, R).astype(np.float32)
    dx = np.full((R,), 64.0, np.float32)
    got = np.asarray(decode_pallas.decode_pallas_rows(
        jnp.asarray(words), jnp.asarray(keys), width, n,
        jnp.asarray(x0), jnp.asarray(dx), box=64.0, periodic=True,
        interpret=True))
    for r in range(R):
        ref = np.asarray(decode_pallas.decode_pallas(
            jnp.asarray(words[r]), jnp.asarray(keys[r]), width, n,
            float(x0[r]), 64.0, 64.0, periodic=True, interpret=True))
        np.testing.assert_array_equal(got[r], ref)


@pytest.mark.parametrize("width", [1, 10, 24, 32])
def test_unpack_rows_matches_per_row(width):
    """unpack_pallas_rows row r == bitpack.uniform_unpack(words[r])."""
    from minnow_c_tpu.ops import bitpack
    n = SMALL + 96
    R = 3
    rng = np.random.default_rng(width)
    bins = rng.integers(0, 1 << width, (R, n),
                        dtype=np.uint64).astype(np.uint32)
    words = np.stack([native.uniform_pack_host(b, width) for b in bins])
    got = np.asarray(decode_pallas.unpack_pallas_rows(
        jnp.asarray(words), width, n, interpret=True))
    np.testing.assert_array_equal(got, bins)
    for r in range(R):
        ref = np.asarray(bitpack.uniform_unpack(
            jnp.asarray(words[r]), width, n))
        np.testing.assert_array_equal(got[r], ref)


def test_pallas_rows_rejects_unaligned():
    with pytest.raises(ValueError):
        decode_pallas.decode_pallas_rows(
            jnp.zeros((2, 8), jnp.uint32), jnp.zeros((2, 2), jnp.uint32),
            4, 33, jnp.zeros((2,)), jnp.ones((2,)))


def test_pallas_no_periodic():
    n = SMALL
    rng = np.random.default_rng(0)
    bins = rng.integers(0, 1 << 9, n, dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(native.uniform_pack_host(bins, 9))
    key = _rng.field_key_arr(3, 0, 0)
    ref = np.asarray(fastpath.fast_uniform_decode(
        words, key, 9, n, -2.0, 4.0))
    got = np.asarray(decode_pallas.decode_pallas(
        words, key, 9, n, -2.0, 4.0, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_tile_cascade(monkeypatch):
    """A stream spanning several cascade tile sizes decodes identically
    to the XLA path (counter bases must line up across pallas_calls)."""
    monkeypatch.setattr(decode_pallas, "_TILE_CASCADE",
                        (1 << 15, 1 << 14))
    width = 13
    n = (1 << 15) + (1 << 14) + 900     # 1 big tile, 1 small, XLA tail
    rng = np.random.default_rng(7)
    bins = rng.integers(0, 1 << width, n, dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(native.uniform_pack_host(bins, width))
    key = _rng.field_key_arr(2, 0, 1)
    ref = np.asarray(fastpath.fast_uniform_decode(
        words, key, width, n, 0.25, 16.0, periodic_width=16.0))
    got = np.asarray(decode_pallas.decode_pallas(
        words, key, width, n, 0.25, 16.0, 16.0, periodic=True,
        interpret=True))
    np.testing.assert_array_equal(got, ref)


class TestEncodePallas:
    @pytest.mark.parametrize("width", [1, 11, 24])
    @pytest.mark.parametrize("n_extra", [0, 4096])
    def test_encode_matches_xla(self, width, n_extra):
        from minnow_c_tpu.ops import encode_pallas
        n = SMALL + n_extra
        rng = np.random.default_rng(width + n_extra)
        x = jnp.asarray(rng.uniform(0, 64.0, n).astype(np.float32))
        wp, x0p, rp = encode_pallas.encode_pallas(
            x, width, periodic_width=64.0, interpret=True)
        wx, x0x, rx = fastpath.fast_uniform_encode(
            x, width, periodic_width=64.0)
        assert float(x0p) == float(x0x) and float(rp) == float(rx)
        np.testing.assert_array_equal(np.asarray(wp), np.asarray(wx))

    @pytest.mark.parametrize("width", [1, 14, 24])
    def test_pack_matches_einsum(self, width):
        from minnow_c_tpu.ops import encode_pallas
        n = SMALL + 900                 # kernel tile + XLA tail
        rng = np.random.default_rng(width)
        bins = jnp.asarray(rng.integers(
            0, 1 << width, n, dtype=np.uint64).astype(np.uint32))
        ref = np.asarray(bitpack.uniform_pack(bins, width))
        got = np.asarray(encode_pallas.pack_pallas(
            bins, width, n, interpret=True))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("width", [1, 14, 24])
    def test_pack_rows_matches_per_row(self, width):
        from minnow_c_tpu.ops import encode_pallas
        n = SMALL + 64
        R = 3
        rng = np.random.default_rng(width)
        bins = jnp.asarray(rng.integers(
            0, 1 << width, (R, n), dtype=np.uint64).astype(np.uint32))
        got = np.asarray(encode_pallas.pack_pallas_rows(
            bins, width, interpret=True))
        for r in range(R):
            ref = np.asarray(bitpack.uniform_pack(bins[r], width))
            np.testing.assert_array_equal(got[r], ref)

    def test_pack_cascade(self, monkeypatch):
        from minnow_c_tpu.ops import encode_pallas
        monkeypatch.setattr(encode_pallas, "_TILE_CASCADE",
                            (1 << 15, 1 << 14))
        width = 13
        n = (1 << 15) + (1 << 14) + 900
        rng = np.random.default_rng(3)
        bins = jnp.asarray(rng.integers(
            0, 1 << width, n, dtype=np.uint64).astype(np.uint32))
        ref = np.asarray(bitpack.uniform_pack(bins, width))
        got = np.asarray(encode_pallas.pack_pallas(
            bins, width, n, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_encode_decode_closure(self):
        """Pallas encode -> Pallas decode round trip within one bin."""
        from minnow_c_tpu.ops import encode_pallas
        n, W, width = SMALL, 64.0, 12
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(0, W, n).astype(np.float32))
        words, x0, rv = encode_pallas.encode_pallas(
            x, width, periodic_width=W, interpret=True)
        key = _rng.field_key_arr(1, 0, 0)
        y = np.asarray(decode_pallas.decode_pallas(
            words, key, width, n, x0, rv, W, periodic=True,
            interpret=True))
        err = np.abs(y - np.asarray(x))
        err = np.minimum(err, W - err)
        bin_w = float(rv) / (1 << width)
        assert err.max() <= bin_w * 1.01


def test_unpack_rows_chunked_matches_unchunked(monkeypatch):
    """Row counts above ROW_CHUNK split into multiple pallas calls whose
    concatenated output must equal the single-call result (SMEM tables
    are bounded per call)."""
    from minnow_c_tpu.ops import bitpack
    n, R, width = 128, 9, 7
    rng = np.random.default_rng(0)
    bins = rng.integers(0, 1 << width, (R, n),
                        dtype=np.uint64).astype(np.uint32)
    words = np.stack([native.uniform_pack_host(b, width) for b in bins])
    ref = np.asarray(decode_pallas.unpack_pallas_rows(
        jnp.asarray(words), width, n, interpret=True))
    monkeypatch.setattr(decode_pallas, "ROW_CHUNK", 4)
    got = np.asarray(decode_pallas.unpack_pallas_rows(
        jnp.asarray(words), width, n, interpret=True))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, bins)


def test_decode_rows_chunked_matches_unchunked(monkeypatch):
    n, R, width = 160, 6, 11
    rng = np.random.default_rng(1)
    bins = rng.integers(0, 1 << width, (R, n),
                        dtype=np.uint64).astype(np.uint32)
    words = np.stack([native.uniform_pack_host(b, width) for b in bins])
    keys = rng.integers(0, 1 << 32, (R, 2), dtype=np.uint64).astype(
        np.uint32)
    x0 = jnp.asarray(rng.uniform(0, 1, R).astype(np.float32))
    dx = jnp.asarray(rng.uniform(1, 2, R).astype(np.float32))
    args = (jnp.asarray(words), jnp.asarray(keys), width, n, x0, dx)
    ref = np.asarray(decode_pallas.decode_pallas_rows(
        *args, box=64.0, periodic=True, interpret=True))
    monkeypatch.setattr(decode_pallas, "ROW_CHUNK", 2)
    got = np.asarray(decode_pallas.decode_pallas_rows(
        *args, box=64.0, periodic=True, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_decode_rows_rejects_width_over_24():
    """Float depths cap at 24 bits (f32 mantissa); the kernels' int32-
    routed bin->float cast is only exact to 24 bits, so wider float
    decodes must be refused (IDs unpack, which has no float stage, does
    accept up to 32 -- see test_unpack_rows_matches_per_row[32])."""
    words = jnp.zeros((2, 32), jnp.uint32)
    keys = jnp.zeros((2, 2), jnp.uint32)
    z = jnp.zeros((2,), jnp.float32)
    with pytest.raises(ValueError, match="24"):
        decode_pallas.decode_pallas_rows(words, keys, 32, 32, z, z,
                                         interpret=True)
    with pytest.raises(ValueError, match="24"):
        decode_pallas.decode_pallas(jnp.zeros((32,), jnp.uint32),
                                    jnp.zeros((2,), jnp.uint32), 25, 32,
                                    0.0, 1.0, interpret=True)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("n", [SMALL + 64, 1000, 96])
def test_stats_rows_matches_xla(periodic, n):
    """stats_pallas_rows == vmapped XLA stats bit-for-bit, including
    non-tile-multiple (masked-pad) and non-32-aligned row lengths and
    wrapped periodic clusters."""
    import jax
    from minnow_c_tpu.ops import encode_pallas
    from minnow_c_tpu.parallel.sharding import _float_block_stats

    R, box = 6, 64.0
    rng = np.random.default_rng(n + periodic)
    # Tight clusters that straddle the periodic boundary exercise the
    # anchored unwrap (values land outside [0, box) after unwrapping).
    centers = rng.uniform(0, box, (R, 1))
    x = ((centers + rng.normal(0, 3.0, (R, n))) % box).astype(np.float32)
    xj = jnp.asarray(x)
    mn, mx = encode_pallas.stats_pallas_rows(
        xj, jnp.full((R,), np.float32(box)), xj[:, 0], periodic,
        interpret=True)
    xb = xj.reshape(R // 3, 3, n)
    x0_ref, rng_ref = jax.vmap(
        lambda b: _float_block_stats(b, box if periodic else None))(xb)
    np.testing.assert_array_equal(np.asarray(mn).reshape(R // 3, 3),
                                  np.asarray(x0_ref))
    rng_rows = (np.asarray(mx) - np.asarray(mn)).reshape(R // 3, 3)
    np.testing.assert_array_equal(rng_rows.max(axis=1),
                                  np.asarray(rng_ref))


def test_float_rows_stats_dispatch_parity():
    """_float_rows_stats Pallas path (interpret) == XLA fallback."""
    from minnow_c_tpu.parallel.sharding import (_float_rows_stats,
                                                _float_block_stats)
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 64.0, (4, 3, 1 << 10)).astype(np.float32))
    for box in (64.0, None):
        x0_p, rng_p = _float_rows_stats(x, box, True, True)
        x0_x, rng_x = _float_rows_stats(x, box, False, False)
        np.testing.assert_array_equal(np.asarray(x0_p), np.asarray(x0_x))
        np.testing.assert_array_equal(np.asarray(rng_p), np.asarray(rng_x))


@pytest.mark.parametrize("width", [1, 14, 24])
def test_rows_natural_layout_matches_pretransposed(width):
    """pretranspose=False (in-kernel VMEM transpose, the HBM-regime
    layout) is bit-identical to the pre-transposed layout."""
    n = SMALL + 64
    R = 4
    rng = np.random.default_rng(100 + width)
    bins = rng.integers(0, 1 << width, (R, n),
                        dtype=np.uint64).astype(np.uint32)
    words = jnp.asarray(
        np.stack([native.uniform_pack_host(b, width) for b in bins]))
    keys = jnp.asarray(np.stack(
        [np.asarray(_rng.field_key_arr(3, r, 0)) for r in range(R)])
        .astype(np.uint32))
    x0 = jnp.asarray(np.linspace(0.0, 3.0, R).astype(np.float32))
    dx = jnp.full((R,), 64.0, jnp.float32)
    a = np.asarray(decode_pallas.decode_pallas_rows(
        words, keys, width, n, x0, dx, box=64.0, periodic=True,
        interpret=True, pretranspose=True))
    b = np.asarray(decode_pallas.decode_pallas_rows(
        words, keys, width, n, x0, dx, box=64.0, periodic=True,
        interpret=True, pretranspose=False))
    np.testing.assert_array_equal(a, b)
    ua = np.asarray(decode_pallas.unpack_pallas_rows(
        words, width, n, interpret=True, pretranspose=True))
    ub = np.asarray(decode_pallas.unpack_pallas_rows(
        words, width, n, interpret=True, pretranspose=False))
    np.testing.assert_array_equal(ua, ub)
    np.testing.assert_array_equal(ua, bins)


@pytest.mark.parametrize("n", [1 << 14, (1 << 16) + (1 << 14),
                               (1 << 19) + (1 << 14) + 1000, 97])
def test_cumsum_u32_matches_jnp(n):
    """Pallas streaming prefix sum == jnp.cumsum bit-for-bit (mod-2^32
    wrap included)."""
    from minnow_c_tpu.ops import scan_pallas
    rng = np.random.default_rng(n)
    x = rng.integers(0, 1 << 32, n, dtype=np.int64).astype(np.uint32)
    ref = np.cumsum(x.astype(np.uint64)).astype(np.uint32)
    got = np.asarray(scan_pallas.cumsum_u32(jnp.asarray(x),
                                            interpret=True))
    np.testing.assert_array_equal(got, ref)


class TestChunkedDeltaKernel:
    """ops/chunked_pallas.py: fused chunked-width delta decode
    (interpreter mode).  Parity: first + cumsum(unzigzag(unpack)) in
    u32 wrap, across mixed per-chunk widths, ragged tails, and the
    zero-width (constant) chunk."""

    CHUNK = 16384

    def _build(self, widths_pattern, seed=0, trim=0):
        from minnow_c_tpu.ops import chunked_pallas, kernels
        rng = np.random.default_rng(seed)
        n_chunks = len(widths_pattern)
        n = self.CHUNK * n_chunks - trim
        zz = np.zeros(n_chunks * self.CHUNK, np.uint32)
        for c, w in enumerate(widths_pattern):
            if w:
                zz[c * self.CHUNK:(c + 1) * self.CHUNK] = rng.integers(
                    0, 1 << w, self.CHUNK, dtype=np.int64)
        zz = zz[:n].copy()
        zz[0] = 0
        first = int(rng.integers(0, 1 << 31))
        # reference: u32 cumsum of unzigzag
        zi = zz.astype(np.int64)
        d = ((zi >> 1) ^ -(zi & 1)).astype(np.int64)
        ref = (first + np.cumsum(d)) % (1 << 32)
        return zz, first, ref.astype(np.uint32), n

    def _pack(self, zz, n_chunks):
        from minnow_c_tpu.ops import bitpack as bp
        from minnow_c_tpu.ops import chunked_pallas
        zp = np.zeros(n_chunks * self.CHUNK, np.uint32)
        zp[:len(zz)] = zz
        zc = zp.reshape(n_chunks, self.CHUNK)
        widths = np.asarray([int(c.max()).bit_length() for c in zc],
                            np.uint8)
        parts = [chunked_pallas.body_to_cmajor(
            np.asarray(bp.uniform_pack(jnp.asarray(zc[c]),
                                       int(widths[c]))),
            int(widths[c]), self.CHUNK)
            for c in range(n_chunks) if widths[c]]
        body = np.concatenate(parts) if parts else np.zeros(0, np.uint32)
        return body, widths

    @pytest.mark.parametrize("pattern", [
        (7, 15, 7), (24,), (0, 9, 0, 3), (1, 32, 5)])
    def test_prefix_matches_cumsum(self, pattern):
        from minnow_c_tpu.ops import chunked_pallas
        zz, first, ref, n = self._build(pattern, trim=137)
        body, widths = self._pack(zz, len(pattern))
        out = np.asarray(chunked_pallas.decode_chunked_stream(
            body, widths, first, self.CHUNK, n, zigzag=True,
            prefix=True, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_unpack_only_mode(self):
        from minnow_c_tpu.ops import chunked_pallas
        zz, _, _, n = self._build((5, 11), trim=64)
        body, widths = self._pack(zz, 2)
        out = np.asarray(chunked_pallas.decode_chunked_stream(
            body, widths, 0, self.CHUNK, n, zigzag=False,
            prefix=False, interpret=True))
        np.testing.assert_array_equal(out, zz)

    def test_cmajor_roundtrip(self):
        from minnow_c_tpu.ops import chunked_pallas
        rng = np.random.default_rng(3)
        for w in (1, 7, 32):
            nat = rng.integers(0, 1 << 32, self.CHUNK * w // 32,
                               dtype=np.int64).astype(np.uint32)
            cm = chunked_pallas.body_to_cmajor(nat, w, self.CHUNK)
            back = chunked_pallas.body_from_cmajor(cm, w, self.CHUNK)
            np.testing.assert_array_equal(back, nat)

    def test_rejects_wrong_chunk(self):
        from minnow_c_tpu.ops import chunked_pallas
        with pytest.raises(ValueError, match="16384"):
            chunked_pallas.decode_chunked_stream(
                np.zeros(32, np.uint32), np.asarray([4], np.uint8), 0,
                1024, 1024, interpret=True)


class TestEncodeRecipFused:
    """encode_recip_fused_blocks: one-pass stats+recip+bin+pack, parity
    with the split pipeline (interpreter mode)."""

    @pytest.mark.parametrize("periodic", [True, False])
    def test_matches_split_path(self, periodic):
        import jax
        from minnow_c_tpu.ops import encode_pallas as ep
        from minnow_c_tpu.ops import kernels
        from minnow_c_tpu.parallel.sharding import _rows_stats_raw
        rng = np.random.default_rng(1)
        B, D, n, depth, W = 3, 3, 2048, 14, 64.0
        x = rng.uniform(0, W, (B, D, n)).astype(np.float32)
        xd = jnp.asarray(x)
        box = W if periodic else None
        words, mn, mx = ep.encode_recip_fused_blocks(
            xd, jnp.float32(W if periodic else 0.0), xd[:, :, 0], depth,
            periodic, interpret=True)
        rows = xd.reshape(B * D, n)
        mn2, mx2 = _rows_stats_raw(rows, box, False, False)
        rng_b = jnp.max((mx2 - mn2).reshape(B, D), axis=1)
        recip = kernels.exact_recip(rng_b)
        bins = jax.vmap(
            lambda r, o, rc, a: ep._recip_bins_xla(
                r, o, rc, jnp.float32(W if periodic else 0.0), a, depth,
                periodic))(rows, mn2, jnp.repeat(recip, D), rows[:, 0])
        w2 = jax.vmap(lambda b: bitpack.uniform_pack(b, depth))(bins)
        np.testing.assert_array_equal(
            np.asarray(words).reshape(B * D, -1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(mn).reshape(-1),
                                      np.asarray(mn2))
        np.testing.assert_array_equal(np.asarray(mx).reshape(-1),
                                      np.asarray(mx2))

    def test_constant_plane(self):
        from minnow_c_tpu.ops import encode_pallas as ep
        x = jnp.full((1, 3, 1024), 7.5, jnp.float32)
        words, mn, mx = ep.encode_recip_fused_blocks(
            x, jnp.float32(0.0), x[:, :, 0], 11, False, interpret=True)
        np.testing.assert_array_equal(np.asarray(words),
                                      np.zeros_like(np.asarray(words)))
        assert float(np.asarray(mn)[0, 0]) == 7.5


class TestChunkedFloatsKernel:
    """floats mode of the chunked kernel (interpreter): one-pass unpack
    + cumsum + dither + undo must be bit-identical to the two-stage
    path (kernel bins + the XLA undo tail)."""

    @pytest.mark.parametrize("periodic", [True, False])
    def test_matches_two_stage(self, periodic):
        from minnow_c_tpu.algos.algo_coil_v1_1 import _coil11_undo_tail
        from minnow_c_tpu.ops import bitpack as bp
        from minnow_c_tpu.ops import chunked_pallas, kernels
        from minnow_c_tpu.ops import rng as _rng
        CH = 16384
        rng = np.random.default_rng(6)
        n = 2 * CH + 513
        depth = 14
        walk = np.cumsum(rng.integers(-40, 41, n), dtype=np.int64)
        bins = ((walk - walk.min()) % (1 << depth)).astype(np.uint32)
        zz = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(bins))).copy()
        zz[0] = 0
        first = int(bins[0])
        n_chunks = -(-n // CH)
        zp = np.zeros(n_chunks * CH, np.uint32)
        zp[:n] = zz
        zc = zp.reshape(n_chunks, CH)
        widths = np.asarray([int(c.max()).bit_length() for c in zc],
                            np.uint8)
        parts = [chunked_pallas.body_to_cmajor(
            np.asarray(bp.uniform_pack(jnp.asarray(zc[c]),
                                       int(widths[c]))),
            int(widths[c]), CH) for c in range(n_chunks) if widths[c]]
        body = np.concatenate(parts) if parts else np.zeros(0, np.uint32)
        key = _rng.field_key_arr(99, 1, 2)
        W, x0, dx = 64.0, 0.25, 63.0
        got = np.asarray(chunked_pallas.decode_chunked_stream_floats(
            body, widths, first, CH, n, np.asarray(key), depth, x0, dx,
            W, periodic, interpret=True))
        ref_bins = chunked_pallas.decode_chunked_stream(
            body, widths, first, CH, n, interpret=True)
        ref = np.asarray(_coil11_undo_tail(
            jnp.asarray(ref_bins), jnp.asarray(key), n, depth, x0, dx,
            jnp.float32(W), periodic))
        np.testing.assert_array_equal(got, ref)
