#!/usr/bin/env python3
"""Same-process A/B of map table sizes on the large scenario (cancels the
shared-pool session noise that confounds run-to-run comparisons).

Run: PYTHONPATH=.:/root/.axon_site python scripts/ab_table_sizes.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def run_one(cap, hsize, n_frames=50, warmup=8):
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.utils import metrics

    cfg = bench.build_config(large=True)
    cfg.map_capacity = cap
    cfg.map_hash_size = hsize
    seq = bench.make_sequence(True, n_frames)
    vel0 = bench._vel0(seq, "large")
    system = StreamingSlam(cfg, total_frames=bench.TOTAL_FRAMES)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    t0 = time.perf_counter()
    system.precompile()
    pre = time.perf_counter() - t0
    for i in range(warmup):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    med = (time.perf_counter() - t0) / (n_frames - warmup)
    out = system.sync()
    m = metrics.absolute_error(
        out["odom_poses"][:n_frames], seq.poses[:n_frames], align=False
    )
    print(
        f"cap=2^{cap.bit_length()-1} hash=2^{hsize.bit_length()-1}: "
        f"{med*1e3:.1f} ms/frame  ATE {m['ate_rmse_m']:.4f}  "
        f"points {out['neural_points']}  (precompile {pre:.0f}s)",
        flush=True,
    )
    del system
    return med


def main():
    import jax  # noqa

    # interleave to cancel drift
    for _ in range(2):
        run_one(1 << 20, 1 << 22)
        run_one(1 << 18, 1 << 21)


if __name__ == "__main__":
    main()
