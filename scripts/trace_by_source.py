#!/usr/bin/env python3
"""Per-frame device-time attribution grouped by SOURCE LINE: capture a
profiler trace of the streaming frame step, then map every HLO thunk name
(fusion.N / copy-start.N / while.N) back to its source_file:line via the
compiled HLO text, and print ms/frame per source location.

Run: PYTHONPATH=.:/root/.axon_site python scripts/trace_by_source.py
"""

import glob
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from trace_ops import parse_xplane_top  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    large = "--large" in sys.argv
    n_frames = 60 if large else 12
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            n_frames = int(a.split("=")[1])
    cfg = bench.build_config(large=large)
    from clid_slam_tpu.pipeline.streaming import StreamingSlam

    if large:
        seq = bench.make_sequence(True, n_frames + 4)
        vel0 = bench._vel0(seq, "large")
        system = StreamingSlam(cfg, total_frames=bench.TOTAL_FRAMES)
    else:
        from clid_slam_tpu.pipeline.synthetic import generate_sequence

        seq = generate_sequence(
            n_frames=n_frames + 4, n_azimuth=1024, n_elev=32,
            noise_std=0.01, seed=3,
        )
        w = 2 * np.pi / 20.0
        vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
        system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)

    # compiled HLO of the steady step -> name -> source map
    step = system.steps[(True, False)]
    P = cfg.max_scan_points
    txt = (
        step.lower(
            system.state,
            jnp.zeros(P * 5 + 65 * 7, jnp.float32),
        )
        .compile()
        .as_text()
    )
    src_of = {}
    pat = re.compile(
        r"%([\w.\-]+) = [^\n]*?source_file=\"([^\"]+)\" "
        r"source_line=(\d+)"
    )
    for m in pat.finditer(txt):
        src_of[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"

    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()

    logdir = "/tmp/jax_trace_src"
    os.system(f"rm -rf {logdir}")
    n_traced = 3
    with jax.profiler.trace(logdir):
        for i in range(n_frames, n_frames + n_traced):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane captured")
        return
    with open(files[0], "rb") as f:
        data = f.read()

    by_src = defaultdict(float)
    unmapped = defaultdict(float)
    for name, tot_ms, n in parse_xplane_top(data, top_n=100000):
        base = name.split(" ")[0].lstrip("%")
        if base.startswith("jit_") or base.isdigit():
            continue
        key = src_of.get(base)
        per_frame = tot_ms / n_traced
        if key is None:
            # async pairs: copy-start.N maps via its done twin or stays raw
            unmapped[base.split(".")[0]] += per_frame
        else:
            by_src[key] += per_frame
    print("== device ms/frame by source line ==")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v:8.3f}  {k}")
    print("== unmapped by op kind (async copies etc.) ==")
    for k, v in sorted(unmapped.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:8.3f}  {k}")
    print(f"total mapped {sum(by_src.values()):.1f} ms/frame, "
          f"unmapped {sum(unmapped.values()):.1f} ms/frame")


if __name__ == "__main__":
    main()
