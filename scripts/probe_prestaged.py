#!/usr/bin/env python3
"""Isolate the 104 ms(device busy) vs 120 ms(wall) frame gap: run the
steady-state streaming step with ALL inputs pre-staged on device, so the
measured loop contains ONLY step dispatches (no uploads at all).

If wall/frame drops to ~device-busy, the gap is per-frame transfer cost;
if it stays, the gap is program-launch overhead on the tunnel.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_prestaged.py
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

    # pre-stage every timed frame's arguments on device
    from clid_slam_tpu.pipeline.streaming import pack_frame_buffers

    p_cap = cfg.max_scan_points
    staged = []
    for i in range(warmup, n_frames):
        pack = pack_frame_buffers(
            p_cap, 64, seq.scans[i][:, :3], None, seq.imu_windows[i],
            i, cfg.max_range, cfg.iters, 0.0, True,
        )
        staged.append((jnp.asarray(pack),))
    jax.block_until_ready(staged)

    step = system.steps[(True, False)]
    state = system.state
    t0 = time.perf_counter()
    for args in staged:
        state = step(state, *args)
    jax.block_until_ready(state.pos)
    dt = (time.perf_counter() - t0) / len(staged)
    print(f"pre-staged wall/frame {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
