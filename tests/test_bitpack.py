"""Bitpack tests: all widths 0-32, word-straddling cases, empty inputs, and
bit-exact parity with the compiled C reference (mirrors
compress_util_test.c:437-550)."""

import numpy as np
import pytest

import jax.numpy as jnp

from minnow_c_tpu.ops import bitpack, native
from tests import ref_oracle


def rand_vals(rng, n, width):
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    return rng.integers(0, 2**width, n, dtype=np.uint64).astype(np.uint32)


class TestUniformPack:
    @pytest.mark.parametrize("width", list(range(33)))
    def test_roundtrip_all_widths(self, width):
        rng = np.random.default_rng(width)
        n = 1000
        x = rand_vals(rng, n, width)
        packed = np.asarray(bitpack.uniform_pack(jnp.asarray(x), width))
        assert packed.shape[0] == bitpack.packed_words(n, width)
        back = np.asarray(
            bitpack.uniform_unpack(jnp.asarray(packed), width, n))
        np.testing.assert_array_equal(back, x)
        # dense variant agrees
        back2 = np.asarray(
            bitpack.uniform_unpack_dense(jnp.asarray(packed), width, n))
        np.testing.assert_array_equal(back2, x)

    @pytest.mark.parametrize("width", [1, 3, 7, 8, 9, 11, 16, 17, 24, 31, 32])
    def test_parity_vs_reference(self, width):
        if ref_oracle.lib() is None:
            pytest.skip("reference oracle unavailable")
        rng = np.random.default_rng(100 + width)
        for n in (1, 2, 31, 32, 33, 1000):
            x = rand_vals(rng, n, width)
            ours = np.asarray(bitpack.uniform_pack(jnp.asarray(x), width))
            ref = ref_oracle.ref_uniform_pack(x, width)
            np.testing.assert_array_equal(ours, ref)
            back_ref = ref_oracle.ref_uniform_unpack(ref, width, n)
            back_ours = np.asarray(
                bitpack.uniform_unpack(jnp.asarray(ours), width, n))
            np.testing.assert_array_equal(back_ours, back_ref)

    @pytest.mark.parametrize("width", [1, 5, 9, 13, 21, 29, 32])
    def test_parity_vs_native_host(self, width):
        rng = np.random.default_rng(200 + width)
        x = rand_vals(rng, 4097, width)
        ours = np.asarray(bitpack.uniform_pack(jnp.asarray(x), width))
        host = native.uniform_pack_host(x, width)
        np.testing.assert_array_equal(ours, host)
        np.testing.assert_array_equal(
            native.uniform_unpack_host(host, width, x.shape[0]), x)

    def test_empty(self):
        x = np.zeros(0, dtype=np.uint32)
        packed = bitpack.uniform_pack(jnp.asarray(x), 9)
        assert packed.shape == (0,)
        assert bitpack.uniform_unpack(packed, 9, 0).shape == (0,)

    def test_width_zero(self):
        x = np.array([1, 2, 3], dtype=np.uint32)
        packed = bitpack.uniform_pack(jnp.asarray(x), 0)
        assert packed.shape == (0,)
        back = np.asarray(bitpack.uniform_unpack(packed, 0, 3))
        np.testing.assert_array_equal(back, np.zeros(3, dtype=np.uint32))

    def test_straddle_exact(self):
        # width 9: elements 3 and 4 straddle the first word boundary.
        x = np.array([0x1FF, 0, 0x155, 0x0AA, 0x1FF], dtype=np.uint32)
        packed = np.asarray(bitpack.uniform_pack(jnp.asarray(x), 9))
        # bit stream: 9 bits per element, little-endian within words
        expected = np.zeros(2, dtype=np.uint64)
        stream = 0
        for i, v in enumerate(x):
            stream |= int(v) << (9 * i)
        exp = np.array([stream & 0xFFFFFFFF, (stream >> 32) & 0xFFFFFFFF],
                       dtype=np.uint32)
        np.testing.assert_array_equal(packed, exp)

    def test_high_bits_discarded(self):
        # Only the low `width` bits of each element are stored (util.h:90-95)
        x = np.array([0xFFFFFFFF, 0xABCD1234], dtype=np.uint32)
        packed = np.asarray(bitpack.uniform_pack(jnp.asarray(x), 4))
        back = np.asarray(bitpack.uniform_unpack(jnp.asarray(packed), 4, 2))
        np.testing.assert_array_equal(back, x & 0xF)

    @pytest.mark.parametrize("width", [0, 1, 7, 9, 14, 16, 17, 24, 31, 32])
    def test_rows_matches_per_row_pack(self, width):
        # uniform_pack_rows row r == uniform_pack(x[r]) bit-for-bit
        rng = np.random.default_rng(100 + width)
        rows, n = 5, 32 * 7
        x = rand_vals(rng, rows * n, max(width, 1)).reshape(rows, n)
        got = np.asarray(bitpack.uniform_pack_rows(jnp.asarray(x), width))
        assert got.shape == (rows, (n // 32) * width)
        for r in range(rows):
            ref = np.asarray(bitpack.uniform_pack(jnp.asarray(x[r]), width))
            np.testing.assert_array_equal(got[r], ref)

    def test_rows_rejects_ragged(self):
        with pytest.raises(ValueError):
            bitpack.uniform_pack_rows(jnp.zeros((2, 33), jnp.uint32), 4)


class TestVariablePack:
    def test_roundtrip_random_widths(self):
        rng = np.random.default_rng(42)
        n = 5000
        widths = rng.integers(0, 25, n).astype(np.uint8)
        x = (rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32) &
             ((np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1)).astype(np.uint32))
        n_words = bitpack.var_packed_words(widths)
        packed = np.asarray(
            bitpack.pack(jnp.asarray(x), jnp.asarray(widths), n_words))
        assert packed.shape[0] == n_words
        back = np.asarray(bitpack.unpack(jnp.asarray(packed),
                                         jnp.asarray(widths)))
        np.testing.assert_array_equal(back, x)

    def test_variable_matches_uniform(self):
        rng = np.random.default_rng(43)
        n = 1000
        width = 11
        x = rand_vals(rng, n, width)
        widths = np.full(n, width, dtype=np.uint8)
        n_words = bitpack.var_packed_words(widths)
        var = np.asarray(
            bitpack.pack(jnp.asarray(x), jnp.asarray(widths), n_words))
        uni = np.asarray(bitpack.uniform_pack(jnp.asarray(x), width))
        np.testing.assert_array_equal(var, uni)

    def test_zero_width_elements(self):
        widths = np.array([0, 3, 0, 3], dtype=np.uint8)
        x = np.array([0, 5, 0, 7], dtype=np.uint32)
        n_words = bitpack.var_packed_words(widths)
        packed = np.asarray(
            bitpack.pack(jnp.asarray(x), jnp.asarray(widths), n_words))
        assert packed.shape[0] == 1
        assert packed[0] == 5 | (7 << 3)
        back = np.asarray(bitpack.unpack(jnp.asarray(packed),
                                         jnp.asarray(widths)))
        np.testing.assert_array_equal(back, x)
