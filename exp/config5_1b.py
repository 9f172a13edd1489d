#!/usr/bin/env python
"""BASELINE config5 at its LITERAL scale: 1B particles through the
streaming snapshot writer (round-4 VERDICT missing #3 -- the only
BASELINE config never attempted).

250 waves x 4M particles stream through the device; segments append to
a real chained file on disk as they finish, so peak memory stays one
wave regardless of snapshot size.  Recorded per the config4 precedent:
wave wall (D2H-tunnel-bound on this runtime, ~25 MB/s) split from the
memory evidence; plus a skip-ahead structural read-back over sampled
segments (per-element delta verification is covered by the suite at
smaller n -- the generated waves are not reproducible here).

Writes the ``config5_1B`` section of bench_results.json (merge-safe).
"""
import json
import os
import resource
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import minnow_c_tpu as mnw
from minnow_c_tpu.bench import harness, records
from minnow_c_tpu.parallel import snapshot
from minnow_c_tpu.segment import api, io as seg_io

W = 64.0
NB = 4_000_000
WAVES = 250                    # 1.0e9 particles
PATH = "/tmp/minnow_1b.min"


def main():
    harness._wait_for_fast_mode()
    rng = np.random.default_rng(5)
    spec = snapshot.SnapshotSpec(
        pos=mnw.PositionAccuracy(delta=1e-3, width=W))

    rss = []
    wave_s = []
    gen_s = []

    def blocks():
        t_prev = time.perf_counter()
        for i in range(WAVES):
            t0 = time.perf_counter()
            pos = rng.uniform(0, W, (3, NB)).astype(np.float32)
            t1 = time.perf_counter()
            gen_s.append(t1 - t0)
            yield {"pos": pos}
            now = time.perf_counter()
            wave_s.append(now - t1)
            rss.append(resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss)
            if i % 25 == 0:
                print(f"wave {i}/{WAVES}: {wave_s[-1]:.2f}s "
                      f"rss={rss[-1]//1024}MB", flush=True)
            t_prev = now

    t0 = time.perf_counter()
    with open(PATH, "wb") as f:
        stats = snapshot.compress_snapshot_streaming(
            f, blocks(), spec, seed=3, depths={"pos": 17})
    wall = time.perf_counter() - t0
    size = os.path.getsize(PATH)
    growth_mb = (rss[-1] - rss[min(1, len(rss) - 1)]) / 1024

    # read-back: walk all 250 headers (skip-ahead), decode a sample of
    # segments, and check STRUCTURE (shape, finiteness, box range) plus
    # the stream-carried bin width against the requested delta.  A true
    # per-value error check against the original data is impossible
    # here (each wave's rng stream was consumed during generation), so
    # this does NOT verify the delta bound per element -- the bound
    # itself is covered by the suite's round-trip tests at smaller n.
    t0 = time.perf_counter()
    with open(PATH, "rb") as f:
        n_seg = seg_io.count_segments(f)
    sample = [0, WAVES // 2, WAVES - 1]
    with open(PATH, "rb") as f:
        for idx, _, body in seg_io.iter_segments_selected(f, sample):
            seg = api.decompress_segment(body, fused=True)
            arr = np.asarray(seg.fields[0].data)
            assert arr.shape == (3, NB)
            assert np.isfinite(arr).all()
            assert (arr >= 0).all() and (arr <= W).all()
            # stream-carried accuracy must honor the requested delta
            assert seg.fields[0].acc.delta <= 1e-3 + 1e-9
    verify_s = time.perf_counter() - t0

    entry = {
        "particles": NB * WAVES,
        "wave_particles": NB,
        "waves": WAVES,
        "segments": n_seg,
        "bytes": size,
        "wall_s": round(wall, 1),
        "wave_s_median_after_warm": round(float(np.median(wave_s[1:])), 2),
        "gen_s_median": round(float(np.median(gen_s)), 2),
        "rss_growth_after_wave1_MB": round(growth_mb, 1),
        "readback_sample_segments": sample,
        "readback_s": round(verify_s, 1),
        "note": "literal BASELINE config5 scale on one chip: 1B "
                "particles streamed in 4M-particle waves; wall is "
                "D2H-tunnel-bound (~25 MB/s); NOTE ru_maxrss grows "
                "~45 MB/wave in THIS environment (remote-tunnel host "
                "staging buffers, not the writer -- a CPU-backend "
                "VmRSS probe holds flat at 0.3 MB/wave; see "
                "bench_results rss_note); read-back decodes sampled "
                "segments via skip-ahead and checks structure",
    }
    os.unlink(PATH)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results.json")
    records.update_sections(path, {"config5_1B": entry})
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
