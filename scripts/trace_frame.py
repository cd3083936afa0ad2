#!/usr/bin/env python3
"""Trace one steady-state streaming frame and print the device-op cost
table (exact XLA op breakdown via jax.profiler).

Run: PYTHONPATH=.:$PYTHONPATH python scripts/trace_frame.py
"""

import glob
import gzip
import json
import sys
import time

import numpy as np


def main():
    import jax

    from clid_slam_tpu.config import Config
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    n_frames = 16
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
    cfg.pool_filter_freq = 10
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    cfg.diff_travel_dist_local = 1e9

    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    w = 2 * np.pi / 20.0
    vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel)

    for i in range(13):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()

    with jax.profiler.trace("/tmp/frame_trace"):
        for i in range(13, 15):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()

    # parse the newest trace
    traces = sorted(glob.glob("/tmp/frame_trace/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    evs = [e for e in d.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("pid") not in (701,)]
    # device events: heuristically keep ones not from python (no $ prefix)
    dev = [e for e in evs if not e.get("name", "").startswith("$")
           and "PjitFunction" not in e.get("name", "")
           and e.get("dur", 0) > 10]
    agg = {}
    for e in dev:
        name = e["name"].split("(")[0][:70]
        agg.setdefault(name, [0.0, 0])
        agg[name][0] += e["dur"] / 1e3
        agg[name][1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"# total device-ish time over 2 frames: {total:.1f} ms")
    for name, (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{ms:9.2f} ms  x{n:3d}  {name}")


if __name__ == "__main__":
    main()
