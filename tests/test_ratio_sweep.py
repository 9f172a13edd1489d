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


class TestSortOrderFreeNiche:
    """Sort's demonstrated niche (round-5 item 9): on single-plane
    order-free archives, the v1.2 rank-free profile is the BEST codec
    outright -- including vs Coil, the best general-purpose codec."""

    def test_dense_perm_ids_sort_wins(self, data):
        arr = data[("unsi", "dense-perm")]
        ref = br.ref_uint_size(arr)
        sort_of = br.our_size("unsi", arr, 0.0, "sort_of")
        others = {c: br.our_size("unsi", arr, 0.0, c)
                  for c in ("trim", "diff", "coil", "sort")}
        assert sort_of < min(others.values()), (sort_of, others)
        assert sort_of < ref, (sort_of, ref)

    def test_order_free_excluded_from_3dim(self, data):
        import pytest
        with pytest.raises(ValueError, match="order-free"):
            br.our_size("posn", data[("posn", "coherent")], 1e-3,
                        "sort_of")
