#!/usr/bin/env python3
"""Benchmark: full SLAM loop (IMU + IESEKF tracking + neural mapping) on a
synthetic LiDAR-inertial sequence at production sizes.

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s", "vs_baseline": R}

vs_baseline is against the reference's real-time budget of 10 scans/s
(100 ms/frame on an RTX 4090 — utils/tools.py:948, BASELINE.md). For an
apples-to-apples accuracy bar, scripts/run_reference_cpu.py runs the
REFERENCE engine (torch, CPU) on this exact sequence: it reports
ATE RMSE 0.111 m at 3.09 s/frame (12 CPU threads).

Default path: the zero-readback streaming loop (pipeline/streaming.py) —
one fused jitted step per frame, all variants AOT-compiled before frame 0.
`python bench.py N --classic` runs the host-driven SlamSystem loop instead.
"""

import json
import sys
import time

import numpy as np


def build_config():
    from clid_slam_tpu.config import Config

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
    return cfg


def main():
    import jax

    from clid_slam_tpu.pipeline.synthetic import generate_sequence
    from clid_slam_tpu.utils import metrics

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    classic = "--classic" in sys.argv
    n_frames = int(args[0]) if args else 25
    warmup = 10

    cfg = build_config()
    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    if classic:
        from clid_slam_tpu.pipeline.slam import SlamSystem

        system = SlamSystem(cfg, total_frames=n_frames + 8)
        system.tracker.x.pos = seq.poses[0][:3, 3].copy()
        system.tracker.x.rot = seq.poses[0][:3, :3].copy()
        system.tracker.x.vel = vel0.copy()
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
        med = float(np.median(frame_times))
        est = system.dataset.odom_poses[:n_frames]
        n_points = int(system.map_state.count)
        extra_mode = "classic"
    else:
        from clid_slam_tpu.pipeline.streaming import StreamingSlam

        system = StreamingSlam(cfg, total_frames=n_frames + 8)
        system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
        t0 = time.perf_counter()
        system.precompile()
        print(
            f"# precompile: {time.perf_counter()-t0:.1f} s", file=sys.stderr
        )
        # warmup frames (map bootstrap; frame 0 runs 400 init iters)
        for i in range(min(warmup, n_frames)):
            t0 = time.perf_counter()
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
            system.block()
            print(
                f"# frame {i}: {(time.perf_counter()-t0)*1e3:.1f} ms",
                file=sys.stderr,
            )
        # measured window: enqueue everything, block once
        system.block()
        t0 = time.perf_counter()
        for i in range(warmup, n_frames):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()
        t1 = time.perf_counter()
        measured = max(n_frames - warmup, 1)
        med = (t1 - t0) / measured
        out = system.sync()
        print(
            f"# steady window: {measured} frames in {t1-t0:.2f} s "
            f"({med*1e3:.1f} ms/frame)  track_iters="
            f"{out['track_iters'][warmup:].tolist()}",
            file=sys.stderr,
        )
        est = out["odom_poses"][:n_frames]
        n_points = out["neural_points"]
        extra_mode = "streaming"

    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    print(f"# ATE RMSE: {m['ate_rmse_m']:.4f} m", file=sys.stderr)

    fps = 1.0 / med
    print(
        json.dumps(
            {
                "metric": "scans_per_sec",
                "value": round(fps, 3),
                "unit": "scans/s",
                "vs_baseline": round(fps / 10.0, 3),
                "extra": {
                    "median_frame_ms": round(med * 1e3, 2),
                    "ate_rmse_m": round(m["ate_rmse_m"], 4),
                    "neural_points": n_points,
                    "mode": extra_mode,
                    "reference_cpu": {
                        "ate_rmse_m": 0.1108,
                        "median_frame_ms": 3091.0,
                    },
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
