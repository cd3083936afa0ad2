#!/usr/bin/env python3
"""Split steady-state frame wall time into host-enqueue vs device time.

Measures, per frame: (a) time spent in process_frame (host preprocess +
uploads + dispatch), (b) wall per frame over the pipelined window, and
(c) upload cost alone (jnp.asarray of the scan buffers).

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_enqueue.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

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

    # per-frame enqueue cost
    enq = []
    t_start = time.perf_counter()
    for i in range(warmup, n_frames):
        t0 = time.perf_counter()
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        enq.append(time.perf_counter() - t0)
    t_enq_done = time.perf_counter()
    system.block()
    t_all = time.perf_counter()
    n = n_frames - warmup
    print(
        f"enqueue/frame {np.median(enq)*1e3:.2f} ms (min {min(enq)*1e3:.2f} "
        f"max {max(enq)*1e3:.2f})   "
        f"enqueue-all {(t_enq_done-t_start)/n*1e3:.2f} ms/f   "
        f"wall/frame {(t_all-t_start)/n*1e3:.2f} ms"
    )

    # upload cost alone
    p_cap = cfg.max_scan_points
    buf = np.zeros((p_cap, 3), np.float32)
    mask = np.zeros(p_cap, bool)
    tsb = np.zeros(p_cap, np.float32)
    imu = np.zeros((64, 7), np.float32)
    for trial in range(3):
        t0 = time.perf_counter()
        ys = []
        for _ in range(10):
            ys.append(
                (
                    jnp.asarray(buf),
                    jnp.asarray(mask),
                    jnp.asarray(tsb),
                    jnp.asarray(imu),
                    jnp.asarray(3, jnp.int32),
                    jnp.asarray(60.0, jnp.float32),
                    jnp.asarray(10, jnp.int32),
                    jnp.asarray(1.0, jnp.float32),
                    jnp.asarray(True),
                )
            )
        jax.block_until_ready(ys)
        dt = (time.perf_counter() - t0) / 10
        print(f"upload set {dt*1e3:.2f} ms")

    # scalar upload alone
    t0 = time.perf_counter()
    ys = []
    for _ in range(50):
        ys.append(jnp.asarray(3, jnp.int32))
    jax.block_until_ready(ys)
    print(f"scalar upload {(time.perf_counter()-t0)/50*1e3:.3f} ms")


if __name__ == "__main__":
    main()
