#!/usr/bin/env python3
"""Minimal steady-state frame-time check of the streaming loop at bench
small shapes: precompile, 12 warm frames, 15 timed frames, one line out.

Run: PYTHONPATH=.:/root/.axon_site python scripts/quick_frame_time.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (enables the persistent compilation cache)


def main():
    import jax

    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.pipeline.synthetic import generate_sequence
    from clid_slam_tpu.utils import metrics

    n_frames = 27
    warmup = 12
    cfg = bench.build_config()
    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    w_rad_s = 2 * np.pi / (20.0 * 0.1)
    r = np.linalg.norm(seq.poses[0][:2, 3])
    vel0 = seq.poses[0][:3, :3] @ np.array([r * w_rad_s, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    t0 = time.perf_counter()
    system.precompile()
    print(f"# precompile {time.perf_counter()-t0:.1f} s", flush=True)
    for i in range(warmup):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    dt = (time.perf_counter() - t0) / (n_frames - warmup)
    out = system.sync()
    m = metrics.absolute_error(
        out["odom_poses"][:n_frames], seq.poses[:n_frames], align=False
    )
    print(
        f"frame {dt*1e3:.1f} ms   ATE {m['ate_rmse_m']:.4f} m   "
        f"points {out['neural_points']}   iters {out['track_iters'][-8:]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
