#!/usr/bin/env python3
"""Benchmark: full SLAM loop (IMU + IESEKF tracking + neural mapping) on a
synthetic LiDAR-inertial sequence at production sizes.

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s", "vs_baseline": R}

vs_baseline is against the reference's real-time budget of 10 scans/s
(100 ms/frame on an RTX 4090 — utils/tools.py:948, BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from clid_slam_tpu.config import Config
    from clid_slam_tpu.pipeline.slam import SlamSystem
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    # warmup must cover the first pool-filter frame (frame 9 with
    # pool_filter_freq=10) so both prep executables are compiled before
    # measurement starts
    warmup = 10

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
    cfg.bs = 16384
    cfg.bs_new_sample = 1000
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
    # the sliding window (60 m) moves ~0.1 m/frame: filtering the pool
    # every frame is pure overhead (O(pool) compaction)
    cfg.pool_filter_freq = 10
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    cfg.diff_travel_dist_local = 1e9

    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    system = SlamSystem(cfg, total_frames=n_frames + 8)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    frame_times = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        t1 = time.perf_counter()
        if i >= warmup:
            frame_times.append(t1 - t0)
        print(
            f"# frame {i}: {(t1-t0)*1e3:.1f} ms "
            f"(track {st.timings.get('tracking',0)*1e3:.1f}, "
            f"prep {st.timings.get('map_prep',0)*1e3:.1f}, "
            f"opt {st.timings.get('map_opt',0)*1e3:.1f}) "
            f"ok={st.tracking_ok} it={st.track_iters}",
            file=sys.stderr,
        )

    from clid_slam_tpu.utils import metrics

    est = system.dataset.odom_poses[:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    print(f"# ATE RMSE: {m['ate_rmse_m']:.4f} m", file=sys.stderr)

    # median: robust to stray one-time compiles / shared-TPU hiccups
    mean_t = float(np.median(frame_times))
    fps = 1.0 / mean_t
    print(
        json.dumps(
            {
                "metric": "scans_per_sec",
                "value": round(fps, 3),
                "unit": "scans/s",
                "vs_baseline": round(fps / 10.0, 3),
                "extra": {
                    "median_frame_ms": round(mean_t * 1e3, 2),
                    "ate_rmse_m": round(m["ate_rmse_m"], 4),
                    "neural_points": int(system.map_state.count),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
