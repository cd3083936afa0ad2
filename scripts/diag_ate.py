#!/usr/bin/env python3
"""ATE diagnostic: run the bench workload (optionally shrunk) and print
per-frame translation error vs ground truth — pinpoints WHERE a trajectory
degrades instead of one end-of-run RMSE. CPU-runnable (JAX_PLATFORMS=cpu)
for code-change bisection without the TPU.

Usage: JAX_PLATFORMS=cpu python scripts/diag_ate.py [n_frames] [scale]
  scale=1.0 reproduces bench.py exactly; scale=0.5 halves the ray counts
  and batch size for faster CPU turnaround.
"""

import sys
import time

import numpy as np


def main():
    from clid_slam_tpu.config import Config
    from clid_slam_tpu.pipeline.slam import SlamSystem
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0

    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.search_alpha = 0.5
    cfg.local_voxel_size_m = 0.2
    cfg.surface_sample_range_m = 0.25
    cfg.surface_sample_n = 4
    cfg.free_front_n = 2
    cfg.free_behind_n = 1
    cfg.vox_down_m = 0.1
    cfg.source_vox_down_m = 0.6
    cfg.min_range = 0.5
    cfg.max_range = 60.0
    cfg.bs = int(16384 * scale)
    cfg.bs_new_sample = int(1000 * scale)
    cfg.iters = 10
    cfg.init_iter_ratio = 40
    cfg.reg_iter_n = 50
    cfg.freeze_after_frame = 15
    cfg.loss_weight_on = True
    cfg.adaptive_iters = True
    cfg.map_capacity = 1 << 20
    cfg.map_hash_size = 1 << 22
    cfg.local_map_capacity = 1 << 19
    cfg.local_map_hash_size = 1 << 21
    cfg.max_scan_points = 1 << 15
    cfg.max_source_points = 1 << 13
    cfg.pool_capacity = 1 << 21
    cfg.pool_filter_freq = 10
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    cfg.diff_travel_dist_local = 1e9

    seq = generate_sequence(
        n_frames=n_frames,
        n_azimuth=int(1024 * scale),
        n_elev=max(8, int(32 * scale)),
        noise_std=0.01,
        seed=3,
    )
    system = SlamSystem(cfg, total_frames=n_frames + 8)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    for i in range(n_frames):
        t0 = time.perf_counter()
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        dt = time.perf_counter() - t0
        est = system.dataset.odom_poses[i]
        terr = np.linalg.norm(est[:3, 3] - seq.poses[i][:3, 3])
        dR = est[:3, :3].T @ seq.poses[i][:3, :3]
        rerr = np.degrees(
            np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        )
        print(
            f"frame {i:3d}: terr {terr*100:7.2f} cm  rerr {rerr:6.3f} deg "
            f"it={st.track_iters:2d} ok={st.tracking_ok} "
            f"sdf={st.sdf_loss:.4f} {dt*1e3:7.1f} ms",
            flush=True,
        )

    from clid_slam_tpu.utils import metrics

    est = system.dataset.odom_poses[:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    print(f"ATE RMSE: {m['ate_rmse_m']:.4f} m  "
          f"points={int(system.map_state.count)}")


if __name__ == "__main__":
    main()
