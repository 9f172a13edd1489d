#!/usr/bin/env python
"""BASELINE config5's distributed leg at literal total scale: a
1B-particle multi-snapshot batch across 2 processes ("2+ hosts", DCN
emulated over localhost exactly as tests/test_multihost.py does).

Each process streams FIVE 100M-particle snapshots (4M-particle waves)
into its own chained files -- the documented multi-host streaming
convention (each process writes its own blocks;
parallel/snapshot.compress_snapshot_streaming docstring) -- then both
meet in a jax.distributed barrier and process 0 records the batch.
2 x 5 x 100M = 1.0e9 particles.  CPU backend (the single physical chip
cannot host two processes; the distributed code path is identical).

Writes bench_results.json [config5_1B_2proc] (merge-safe).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, resource
proc_id = int(sys.argv[1]); coord = sys.argv[2]; outdir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
import minnow_c_tpu as mnw
from minnow_c_tpu.parallel import multihost, snapshot

multihost.initialize(coord, 2, proc_id)
assert jax.process_count() == 2

W = 64.0
NB = 4_000_000
WAVES = 25          # 100M per snapshot
SNAPS = 5           # x5 snapshots per process
rng = np.random.default_rng(100 + proc_id)
spec = snapshot.SnapshotSpec(pos=mnw.PositionAccuracy(delta=1e-3, width=W))

t0 = time.perf_counter()
total_bytes = 0
for s in range(SNAPS):
    def blocks():
        for _ in range(WAVES):
            yield {"pos": rng.uniform(0, W, (3, NB)).astype(np.float32)}
    path = os.path.join(outdir, f"snap_p{proc_id}_s{s}.min")
    with open(path, "wb") as f:
        st = snapshot.compress_snapshot_streaming(
            f, blocks(), spec, seed=s, depths={"pos": 17})
    total_bytes += os.path.getsize(path)
    print(f"[p{proc_id}] snapshot {s}: {st['num_blocks']} segments",
          flush=True)
wall = time.perf_counter() - t0
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

# both processes finished writing before anyone reads
multihost.barrier("batch_done")

# cross-read: each process opens ONE of the OTHER process's files and
# verifies structure via skip-ahead selected reads
from minnow_c_tpu.segment import api, io as seg_io
other = os.path.join(outdir, f"snap_p{1 - proc_id}_s0.min")
with open(other, "rb") as f:
    n_seg = seg_io.count_segments(f)
assert n_seg == WAVES, n_seg
with open(other, "rb") as f:
    for idx, _, body in seg_io.iter_segments_selected(f, [0, WAVES - 1]):
        seg = api.decompress_segment(body)
        arr = np.asarray(seg.fields[0].data)
        assert arr.shape == (3, NB) and np.isfinite(arr).all()

with open(os.path.join(outdir, f"done{proc_id}.json"), "w") as f:
    f.write(json.dumps({"wall_s": wall, "bytes": total_bytes,
                        "rss_mb": rss_mb}))
print(f"[p{proc_id}] OK wall={wall:.0f}s bytes={total_bytes}", flush=True)
import json
"""


def main():
    import socket
    import tempfile
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    outdir = tempfile.mkdtemp(prefix="minnow_1b2p_")
    script = os.path.join(outdir, "worker.py")
    with open(script, "w") as f:
        f.write("import json\n" + WORKER % {"repo": REPO})
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), coord, outdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = [p.communicate(timeout=7000)[0] for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(outs[i][-3000:])
            raise SystemExit(f"worker {i} failed")
    stats = [json.load(open(os.path.join(outdir, f"done{i}.json")))
             for i in range(2)]
    entry = {
        "processes": 2,
        "snapshots_per_process": 5,
        "particles_total": 2 * 5 * 25 * 4_000_000,
        "bytes_total": sum(s["bytes"] for s in stats),
        "wall_s": round(time.time() - t0, 1),
        "per_process_wall_s": [round(s["wall_s"], 1) for s in stats],
        "per_process_peak_rss_MB": [round(s["rss_mb"]) for s in stats],
        "note": "1B-particle multi-snapshot batch across 2 processes "
                "(jax.distributed, DCN over localhost; CPU backend -- "
                "one physical chip cannot host two processes): each "
                "process streams 5 x 100M-particle snapshots in 4M "
                "waves to its own chained files (the documented "
                "multi-host streaming convention), then cross-reads "
                "the other process's file with skip-ahead selected "
                "segments after a distributed barrier",
    }
    import shutil
    shutil.rmtree(outdir)
    sys.path.insert(0, REPO)
    from minnow_c_tpu.bench import records
    records.update_sections(os.path.join(REPO, "bench_results.json"),
                            {"config5_1B_2proc": entry})
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
