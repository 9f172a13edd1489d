"""L2 quantization engine tests: delta<->depth C-exact derivation and
per-field-type round-trips with the reference's oracles (exact for
IDs/uints, delta-bounded for floats, bin-recovery for the lossy stage)."""

import numpy as np
import pytest

import minnow_c_tpu as mnw
from minnow_c_tpu.quant import engine


def make_field(code, data, acc, algo=mnw.AlgoCode.TRIM, version=0):
    n = data.shape[-1]
    hd = mnw.FieldHeader(field_code=code, algo_code=algo,
                         algo_version=version, particle_len=n)
    return mnw.Field(hd=hd, data=data, acc=acc)


class TestDeltaDepth:
    def test_exact_values(self):
        # delta * 2^depth must exceed the range (quant.c:681-696)
        assert engine.delta_to_depth(1.0, 0.0, 1.0) == 1
        assert engine.delta_to_depth(0.5, 0.0, 1.0) == 2
        assert engine.delta_to_depth(1e-3, 0.0, 1.0) == 10
        assert engine.delta_to_depth(2.0, 0.0, 1.0) == 0

    def test_range_zero(self):
        assert engine.delta_to_depth(1e-3, 5.0, 5.0) == 0

    def test_too_fine_raises(self):
        with pytest.raises(ValueError):
            engine.delta_to_depth(1e-12, 0.0, 1.0)

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(0)
        deltas = 10.0 ** rng.uniform(-6, 0, 100).astype(np.float32)
        got = engine.deltas_to_depths(deltas, 0.0, 1.0)
        want = [engine.delta_to_depth(float(d), 0.0, 1.0) for d in deltas]
        np.testing.assert_array_equal(got, want)

    def test_depth_to_delta_inverse(self):
        for depth in (0, 1, 10, 24):
            delta = engine.depth_to_delta(depth, 0.0, 1.0)
            # re-deriving the depth from the achieved delta must not need
            # more bits
            assert engine.delta_to_depth(delta * 1.0001, 0.0, 1.0) <= depth + 1


class TestPositionRoundTrip:
    def test_delta_bounded(self):
        rng = np.random.default_rng(1)
        n = 50000
        W = 64.0
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        f = make_field(mnw.FieldCode.POSN, pos,
                       mnw.PositionAccuracy(delta=1e-3, width=W))
        qf = engine.quantize(f, seed=7)
        f2 = engine.dequantize(qf)
        out = np.asarray(f2.data)
        err = np.abs(out - pos)
        err = np.minimum(err, W - err)
        assert err.max() <= 1e-3
        assert (out >= 0).all() and (out < W).all()

    def test_per_particle_deltas(self):
        rng = np.random.default_rng(2)
        n = 10000
        W = 32.0
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        deltas = 10.0 ** rng.uniform(-3, -1, n).astype(np.float32)
        f = make_field(mnw.FieldCode.POSN, pos,
                       mnw.PositionAccuracy(delta=0.0, width=W,
                                            deltas=deltas))
        qf = engine.quantize(f, seed=8)
        assert qf.quant.depths is not None
        f2 = engine.dequantize(qf)
        out = np.asarray(f2.data)
        err = np.abs(out - pos)
        err = np.minimum(err, W - err)
        assert (err <= deltas[None, :]).all()

    def test_boundary_cluster(self):
        rng = np.random.default_rng(3)
        n = 5000
        W = 10.0
        pos = (rng.normal(0, 0.25, (3, n)).astype(np.float32) % W)
        f = make_field(mnw.FieldCode.POSN, pos,
                       mnw.PositionAccuracy(delta=1e-4, width=W))
        out = np.asarray(engine.dequantize(engine.quantize(f, 1)).data)
        err = np.abs(out - pos)
        err = np.minimum(err, W - err)
        assert err.max() <= 1e-4


class TestVelocityRoundTrip:
    def test_linear(self):
        rng = np.random.default_rng(4)
        n = 20000
        vel = rng.normal(0, 300, (3, n)).astype(np.float32)
        f = make_field(mnw.FieldCode.VELC, vel,
                       mnw.VelocityAccuracy(delta=0.5))
        f2 = engine.dequantize(engine.quantize(f, 5))
        assert np.abs(np.asarray(f2.data) - vel).max() <= 0.5

    def test_symlog10(self):
        rng = np.random.default_rng(5)
        n = 20000
        vel = rng.normal(0, 300, (3, n)).astype(np.float32)
        f = make_field(mnw.FieldCode.VELC, vel,
                       mnw.VelocityAccuracy(delta=1e-3, sym_log10_scaled=2,
                                            sym_log10_threshold=1.0))
        f2 = engine.dequantize(engine.quantize(f, 6))
        sl = lambda x: np.sign(x) * np.log10(1 + np.abs(x))
        err = np.abs(sl(np.asarray(f2.data)) - sl(vel))
        assert err.max() <= 1.1e-3  # delta in symlog space (+f32 slop)


class TestIDRoundTrip:
    def test_lossless(self):
        rng = np.random.default_rng(6)
        n = 30000
        W = 1024
        ids = rng.permutation(W * W * 16)[:n].astype(np.uint64)
        f = make_field(mnw.FieldCode.PTID, ids, mnw.IDAccuracy(width=W))
        f2 = engine.dequantize(engine.quantize(f))
        np.testing.assert_array_equal(np.asarray(f2.data), ids)

    def test_grid_cluster_wrap(self):
        # A Lagrangian patch wrapping the grid boundary must still be
        # lossless and compact (id unwrap, quant.c:314-320).
        W = 100
        xs = np.array([98, 99, 0, 1], dtype=np.uint64)
        ys = np.array([50, 50, 51, 51], dtype=np.uint64)
        zs = np.array([99, 0, 0, 1], dtype=np.uint64)
        ids = xs + W * ys + W * W * zs
        f = make_field(mnw.FieldCode.PTID, ids, mnw.IDAccuracy(width=W))
        qf = engine.quantize(f)
        # Unwrapped ranges are small (the patch is localized).
        assert all(x1 - x0 < 10 for x0, x1 in zip(qf.quant.x0, qf.quant.x1))
        f2 = engine.dequantize(qf)
        np.testing.assert_array_equal(np.asarray(f2.data), ids)

    def test_nonpow2_width(self):
        rng = np.random.default_rng(7)
        W = 1000
        n = 10000
        ids = rng.integers(0, W**3, n, dtype=np.uint64)
        f = make_field(mnw.FieldCode.PTID, ids, mnw.IDAccuracy(width=W))
        f2 = engine.dequantize(engine.quantize(f))
        np.testing.assert_array_equal(np.asarray(f2.data), ids)


class TestUfloatRoundTrip:
    def test_linear(self):
        rng = np.random.default_rng(8)
        x = rng.uniform(-5, 5, 20000).astype(np.float32)
        f = make_field(mnw.FieldCode.UNSF, x, mnw.FloatAccuracy(delta=1e-2))
        f2 = engine.dequantize(engine.quantize(f, 9))
        assert np.abs(np.asarray(f2.data) - x).max() <= 1e-2

    def test_log10(self):
        rng = np.random.default_rng(9)
        x = (10.0 ** rng.uniform(-3, 8, 20000)).astype(np.float32)
        f = make_field(mnw.FieldCode.UNSF, x,
                       mnw.FloatAccuracy(delta=1e-3, log10_scaled=1))
        f2 = engine.dequantize(engine.quantize(f, 10))
        err = np.abs(np.log10(np.asarray(f2.data)) - np.log10(x))
        assert err.max() <= 1.1e-3


class TestUintRoundTrip:
    def test_lossless_small(self):
        rng = np.random.default_rng(10)
        x = rng.integers(500, 1500, 10000).astype(np.uint64)
        f = make_field(mnw.FieldCode.UNSI, x, mnw.IntAccuracy())
        f2 = engine.dequantize(engine.quantize(f))
        np.testing.assert_array_equal(np.asarray(f2.data), x)

    def test_lossless_u64_range(self):
        rng = np.random.default_rng(11)
        x = rng.integers(0, 2**62, 10000, dtype=np.uint64)
        f = make_field(mnw.FieldCode.UNSI, x, mnw.IntAccuracy())
        qf = engine.quantize(f)
        assert qf.data_hi is not None  # >32-bit range splits planes
        f2 = engine.dequantize(qf)
        np.testing.assert_array_equal(np.asarray(f2.data), x)


class TestDeterminism:
    def test_same_seed_same_decode(self):
        rng = np.random.default_rng(12)
        pos = rng.uniform(0, 8, (3, 1000)).astype(np.float32)
        f = make_field(mnw.FieldCode.POSN, pos,
                       mnw.PositionAccuracy(delta=1e-2, width=8.0))
        qf = engine.quantize(f, seed=99)
        a = np.asarray(engine.dequantize(qf).data)
        b = np.asarray(engine.dequantize(qf).data)
        np.testing.assert_array_equal(a, b)

    def test_different_seed_different_dither(self):
        rng = np.random.default_rng(13)
        pos = rng.uniform(0, 8, (3, 1000)).astype(np.float32)
        f = make_field(mnw.FieldCode.POSN, pos,
                       mnw.PositionAccuracy(delta=1e-2, width=8.0))
        a = np.asarray(engine.dequantize(engine.quantize(f, seed=1)).data)
        b = np.asarray(engine.dequantize(engine.quantize(f, seed=2)).data)
        assert not np.array_equal(a, b)


def test_symlog_flag_any_truthy(make_field=None):
    """The reference treats ANY nonzero SymLog10Scaled as symlog10
    (quant.c:248); a boolean True must not select plain log10, which
    NaNs on signed velocities."""
    import minnow_c_tpu as mnw
    from minnow_c_tpu.quant import quantize, dequantize
    n = 4096
    rng = np.random.default_rng(3)
    vel = rng.normal(0, 300, (3, n)).astype(np.float32)  # signed!
    for flag in (True, 1, 2):
        f = mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.VELC, mnw.AlgoCode.TRIM, 0, n),
            data=vel, acc=mnw.VelocityAccuracy(
                delta=0.01, sym_log10_scaled=flag, sym_log10_threshold=1.0))
        qf = quantize(f, seed=1)
        assert qf.quant.sym_log10_scaled == 2
        out = np.asarray(dequantize(qf, 0).data)
        assert np.isfinite(out).all()


def test_quantize_does_not_mutate_caller_field():
    """Byteswapped input must be normalized into a copy, not written back
    into the caller's Field."""
    import minnow_c_tpu as mnw
    from minnow_c_tpu.quant import quantize
    n = 1024
    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 64.0, (3, n)).astype(">f4")  # big-endian view
    f = mnw.Field(hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TRIM,
                                     0, n),
                  data=pos, acc=mnw.PositionAccuracy(delta=1e-3, width=64.0))
    quantize(f, seed=1)
    assert f.data is pos
    assert f.data.dtype.str == ">f4"


class TestUnmapPrecision:
    """Property tests bounding the transcendental unmap error against
    f64 host references over adversarial ranges (quant.c:735-757
    analog).  The decode side computes ``exp2(y * log2 10)`` in f32;
    these pin its error envelope so a backend/XLA change that degrades
    the transcendental shows up as a failure, not a silent accuracy
    loss."""

    # Measured envelope (CPU XLA): |log10(unmap(y)) - y| peaks at
    # 3.49e-6 at |y| ~ 38; the |y|-proportional term is the f32
    # rounding of y * log2(10), the constant is exp2's own ULPs.
    ENV_SLOPE = 8e-8
    ENV_CONST = 1.2e-6

    def _mapped_err(self, y, mode, threshold):
        import jax.numpy as jnp
        from minnow_c_tpu.quant.engine import unmap_float
        got = np.asarray(unmap_float(jnp.asarray(y), mode, threshold)
                         ).astype(np.float64)
        ok = np.isfinite(got)
        if mode == 1:
            ok &= got > 0
            remapped = np.full_like(got, np.nan)
            remapped[ok] = np.log10(got[ok])
        else:
            t = float(threshold)
            remapped = np.sign(got) * np.log10(1.0 + np.abs(got) / t)
        return np.abs(remapped[ok] - y[ok].astype(np.float64)), y[ok]

    def test_log10_unmap_error_envelope(self):
        rng = np.random.default_rng(0)
        y = np.concatenate([
            rng.uniform(-38, 38, 100_000),
            np.linspace(-37.9, 37.9, 50_000),
            np.array([0.0, 1.0, -1.0, 1e-30, 37.9, -37.9]),
        ]).astype(np.float32)
        err, yy = self._mapped_err(y, 1, 0.0)
        bound = np.abs(yy) * self.ENV_SLOPE + self.ENV_CONST
        assert (err <= bound).all(), \
            (err / bound).max()

    def test_symlog_unmap_error_envelope(self):
        rng = np.random.default_rng(1)
        for t in (1e-6, 1.0, 1e4):
            ylim = float(np.log10(1 + 3.0e38 / t))
            y = np.concatenate([
                rng.uniform(-ylim, ylim, 100_000),
                np.linspace(-ylim, ylim, 50_000),
            ]).astype(np.float32)
            err, yy = self._mapped_err(y, 2, t)
            bound = np.abs(yy) * self.ENV_SLOPE + self.ENV_CONST
            assert (err <= bound).all(), \
                (t, (err / bound).max())

    def test_unmap_error_within_reported_accuracy(self):
        """End-to-end: a symlog velocity decode's total error (bin +
        dither + unmap) stays within the reported Accuracy for the
        canonical use case (delta in mapped space, realistic depths)."""
        import minnow_c_tpu as mnw
        from minnow_c_tpu.quant import engine
        rng = np.random.default_rng(5)
        n = 30_000
        vel = np.concatenate([
            rng.normal(0, 300, (3, n // 2)),
            np.sign(rng.normal(size=(3, n - n // 2))) *
            10.0 ** rng.uniform(-3, 7, (3, n - n // 2)),
        ], axis=1).astype(np.float32)
        delta = 1e-3   # mapped-space accuracy request
        f = mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.VELC, mnw.AlgoCode.TRIM, 0,
                               n),
            data=vel, acc=mnw.VelocityAccuracy(
                delta=delta, sym_log10_scaled=2,
                sym_log10_threshold=20.0))
        qf = engine.quantize(f, seed=9)
        out = engine.dequantize(qf, field_index=0)
        t = 20.0
        m = lambda v: np.sign(v) * np.log10(1.0 + np.abs(v) / t)
        merr = np.abs(m(np.asarray(out.data).astype(np.float64)) -
                      m(vel.astype(np.float64)))
        # reported accuracy is the achieved bin width; the unmap adds
        # its (much smaller) envelope on top
        rep = out.acc.delta
        assert rep <= delta
        assert merr.max() <= rep + self.ENV_CONST + \
            np.abs(m(vel.astype(np.float64))).max() * self.ENV_SLOPE
