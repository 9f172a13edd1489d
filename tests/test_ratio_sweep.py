"""Compressed-size parity sweep (BASELINE "compressed size <= C
reference"): not one point but a matrix over codecs, field types,
orderings, and accuracies.  ``bench_ratio.py`` runs the full-size sweep
and records the table; this test asserts the invariant on a reduced grid
so it stays in the suite's time budget.
"""

import numpy as np
import pytest

import minnow_c_tpu as mnw

import bench_ratio as br

HEADER_ALLOWANCE = 512  # fixed metadata: segment/field/block headers


@pytest.fixture(scope="module")
def data():
    return br.datasets(n=60_000, seed=3)


class TestRatioSweep:
    @pytest.mark.parametrize("kind,order,delta", [
        (k, o, d)
        for k in ("posn", "velc", "unsf")
        for o in ("coherent", "random")
        for d in (br.DELTAS[k][0], br.DELTAS[k][-1])
    ])
    def test_trim_within_reference(self, data, kind, order, delta):
        arr = data[(kind, order)]
        ref = br.ref_float_planes_size(arr, delta)
        ours = br.our_size(kind, arr, delta, "trim")
        assert ours <= ref + HEADER_ALLOWANCE, (ours, ref)

    @pytest.mark.parametrize("kind", ["posn", "velc", "unsf"])
    def test_best_codec_beats_reference_on_coherent(self, data, kind):
        """Spatially/temporally coherent orderings are the reference's
        own motivating workload; with the transform codecs available the
        framework must beat its flat pipeline outright."""
        arr = data[(kind, "coherent")]
        delta = br.DELTAS[kind][-1]
        ref = br.ref_float_planes_size(arr, delta)
        sizes = [br.our_size(kind, arr, delta, c)
                 for c in ("trim", "diff", "sort", "cart")]
        assert min(sizes) < ref, (sizes, ref)

    def test_ids_within_reference(self, data):
        for order in ("coherent", "random"):
            ids = data[("ptid", order)]
            ref = br.ref_id_size(ids)
            ours = br.our_size("ptid", ids, 0.0, "trim")
            assert ours <= ref + HEADER_ALLOWANCE, (order, ours, ref)

    def test_coherent_ids_beat_reference_with_diff(self, data):
        # LZ4 already exploits the grid-coordinate sawtooth's regularity,
        # so the margin is modest -- but Diff must still win outright.
        ids = data[("ptid", "coherent")]
        ref = br.ref_id_size(ids)
        diff = br.our_size("ptid", ids, 0.0, "diff")
        assert diff < ref, (diff, ref)
