#!/usr/bin/env python3
"""Same-process A/B of search_alpha (81 vs 57 probed neighbor cells) on
both bench scales — the probe mirror gathers are the largest mapped line
(neural_map.py:237, trace_by_source r5).

Run: PYTHONPATH=.:/root/.axon_site python scripts/ab_alpha.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def run_one(large, alpha, n_frames=50, warmup=8):
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.utils import metrics

    cfg = bench.build_config(large=large)
    cfg.search_alpha = alpha
    seq = bench.make_sequence(large, n_frames)
    label = "large" if large else "small"
    vel0 = bench._vel0(seq, label)
    system = StreamingSlam(cfg, total_frames=bench.TOTAL_FRAMES)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    system.precompile()
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
        f"{label} alpha={alpha}: {med*1e3:.1f} ms/frame  "
        f"ATE {m['ate_rmse_m']:.4f}  points {out['neural_points']}",
        flush=True,
    )
    del system
    return med


def main():
    for _ in range(2):
        for large in (False, True):
            run_one(large, 0.5)
            run_one(large, 0.2)


if __name__ == "__main__":
    main()
