#!/usr/bin/env python3
"""Reproduce the frame-3 rotation snap on TPU: run the bench workload for 3
frames, then execute frame 3's IESEKF update BOTH ways — the host loop
(numpy float64 algebra + per-iteration device h_reduce) and the fused
on-device while_loop — printing per-iteration dx. Identifies whether the
bad Kalman step comes from the measurement reduction (S6/b6) or from the
f32 on-device solve."""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from clid_slam_tpu.config import Config
    from clid_slam_tpu.pipeline.slam import SlamSystem
    from clid_slam_tpu.pipeline.synthetic import generate_sequence
    from clid_slam_tpu.odometry import iekf

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
        n_frames=6, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    system = SlamSystem(cfg, total_frames=16)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    for i in range(3):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        est = system.dataset.odom_poses[i]
        terr = np.linalg.norm(est[:3, 3] - seq.poses[i][:3, 3])
        print(f"frame {i}: terr {terr*100:.2f} cm", flush=True)

    # ---- frame 3, by hand
    d = system.dataset
    d.read_frame_arrays(seq.scans[3], None)
    d.preprocess_frame(seq.imu_windows[3])
    frame_id = 3
    window = cfg.diff_travel_dist_local

    tracker = system.tracker
    x_prop_rot = tracker.x.rot.copy()
    x_prop_pos = tracker.x.pos.copy()
    rest0 = np.concatenate(
        [tracker.x.vel, tracker.x.bg, tracker.x.ba, tracker.x.grav]
    )
    P0 = tracker.P.copy()
    gt = seq.poses[3]

    def ang(R):
        d_ = R.T @ gt[:3, :3]
        return np.degrees(np.arccos(np.clip((np.trace(d_) - 1) / 2, -1, 1)))

    print(f"propagated: rerr {ang(x_prop_rot):.3f} deg "
          f"terr {np.linalg.norm(x_prop_pos - gt[:3,3])*100:.2f} cm",
          flush=True)
    ev = np.linalg.eigvalsh(0.5 * (P0 + P0.T))
    print(f"P0 eig range: [{ev.min():.3e}, {ev.max():.3e}]  "
          f"asym {np.abs(P0 - P0.T).max():.3e}", flush=True)

    # (a) host float64 loop with device h_reduce
    def h_reduce(points_imu, mask, R, t, *args):
        return system.h_reduce_core(
            system.map_state, system.mlp, points_imu, mask, R, t,
            system.travel_dist_dev, frame_id, window,
        )

    import copy

    host_tracker = iekf.IEKF(tracker.cfg)
    host_tracker.x = copy.deepcopy(tracker.x)
    host_tracker.P = P0.copy()

    cfgk = tracker.cfg
    x_propagated = copy.deepcopy(host_tracker.x)
    P_inv = np.linalg.inv(host_tracker.P)
    I = np.eye(18)
    for i in range(cfgk.max_iteration):
        dx_new = host_tracker.x.boxminus(x_propagated)
        S6, b6, n_valid, n_total = h_reduce(
            d.cur_source_points,
            d.cur_source_mask,
            jnp.asarray(host_tracker.x.rot, jnp.float32),
            jnp.asarray(host_tracker.x.pos, jnp.float32),
        )
        S6 = np.asarray(S6, np.float64)
        b6 = np.asarray(b6, np.float64)
        S18 = np.zeros((18, 18)); S18[:6, :6] = S6
        b18 = np.zeros(18); b18[:6] = b6
        A_inv = np.linalg.inv(S18 + P_inv)
        KH = A_inv @ S18
        dx = -(A_inv @ b18) + (KH - I) @ dx_new
        host_tracker.x = host_tracker.x.boxplus(dx)
        rot_deg = np.linalg.norm(dx[0:3]) * 180 / np.pi
        tran_m = np.linalg.norm(dx[3:6])
        print(
            f"  host it {i:2d}: |drot| {rot_deg:8.4f} deg |dt| {tran_m*100:7.3f} cm "
            f"valid {int(n_valid)}/{int(n_total)} rerr_now {ang(host_tracker.x.rot):.3f}",
            flush=True,
        )
        if rot_deg < cfgk.term_thre_deg and tran_m < cfgk.term_thre_m and np.all(np.abs(dx[6:]) < cfgk.eps):
            break
    print(f"host final: rerr {ang(host_tracker.x.rot):.4f} deg", flush=True)

    # (b) fused device while_loop (what the bench runs)
    rot, pos, rest, P, ok, n_iter = system.update_iterated_dev(
        system.map_state,
        system.mlp,
        d.cur_source_points,
        d.cur_source_mask,
        jnp.asarray(x_prop_rot, jnp.float32),
        jnp.asarray(x_prop_pos, jnp.float32),
        jnp.asarray(rest0, jnp.float32),
        jnp.asarray(P0, jnp.float32),
        system.travel_dist_dev,
        frame_id,
        window,
    )
    rot = np.asarray(rot, np.float64)
    print(
        f"device final: rerr {ang(rot):.4f} deg  it={int(n_iter)} ok={bool(ok)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
