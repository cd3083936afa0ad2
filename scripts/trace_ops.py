#!/usr/bin/env python3
"""Op-level device-time attribution of the fused streaming frame step:
capture a jax.profiler trace over a few steady-state frames and print the
top HLO ops by self time, parsed from the xplane protobuf.

Run: PYTHONPATH=.:/root/.axon_site python scripts/trace_ops.py
"""

import glob
import gzip
import os
import sys
from collections import defaultdict

import numpy as np

import bench


def main():
    import jax

    n_frames = 12
    cfg = bench.build_config()
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    seq = generate_sequence(
        n_frames=n_frames + 4, n_azimuth=1024, n_elev=32, noise_std=0.01,
        seed=3,
    )
    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()

    logdir = "/tmp/jax_trace_ops"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(n_frames, n_frames + 3):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()

    # find the xplane file
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane captured", glob.glob(f"{logdir}/**", recursive=True))
        return
    from tensorflow.core.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        print(f"== plane: {plane.name}")
        ev_meta = plane.event_metadata
        stats_meta = plane.stat_metadata
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                cnt[name] += 1
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
        total = sum(tot.values())
        print(f"   total event time {total:.1f} ms over 3 frames")
        for name, ms in top:
            print(f"   {ms:9.3f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
