#!/usr/bin/env python3
"""Diagnose the large-bench frame-time: run the bench large scenario and
report per-frame wall times plus the on-device track-iteration and
adaptive-mapping diagnostics that drive the cost.

Run: PYTHONPATH=.:/root/.axon_site python scripts/diag_large_time.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import jax

    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.utils import metrics

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    warmup = 10
    cfg = bench.build_config(large=True)
    seq = bench.make_sequence(True, n_frames)
    vel0 = bench._vel0(seq, "large")
    system = StreamingSlam(cfg, total_frames=bench.TOTAL_FRAMES)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    t0 = time.perf_counter()
    system.precompile()
    print(f"# precompile {time.perf_counter()-t0:.1f} s", flush=True)
    times = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    out = system.sync()
    est = out["odom_poses"][:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    ti = out["track_iters"][:n_frames]
    print(
        f"median {np.median(times)*1e3:.1f} ms  mean {np.mean(times)*1e3:.1f}"
        f"  ATE {m['ate_rmse_m']:.4f}  points {out['neural_points']}"
    )
    print("track_iters:", ti.astype(int).tolist())
    print(
        "frame times (ms):",
        [round(t * 1e3, 1) for t in times[:30]],
    )


if __name__ == "__main__":
    main()
