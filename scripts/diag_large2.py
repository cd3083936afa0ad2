#!/usr/bin/env python3
"""Isolate WHERE the frame-i registration minimum sits, probing each frame's
scan against the map BEFORE that frame is tracked/inserted.

For frames 1..N: evaluate the GN pull at (a) the GT pose of frame i,
(b) the previous frame's ESTIMATED pose (is the minimum pinned to the old
pose?), and (c) the IMU-propagated prior. Then let the frame process
normally and report the filter's internals (velocity/bias state vs truth).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench as B
    from clid_slam_tpu.odometry import iekf
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    seq = B.make_sequence(True, args.frames)

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")

    h_reduce = iekf.make_h_reduce_fn(
        knn_k=cfg.query_nn_k,
        nb_offs=system.nb_offs,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=system.max_valid_dist2,
        sdf_scale=cfg.sdf_scale,
        min_grad_norm=cfg.reg_min_grad_norm,
        max_grad_norm=cfg.reg_max_grad_norm,
        min_nn_count=cfg.track_mask_query_nn_k,
        mlp_leaky=cfg.mlp_leaky_relu,
        mlp_bf16=cfg.mlp_bf16,
        encode_vecs=system.encode_vecs,
        weighted_first=cfg.weighted_first,
        layer_norm=cfg.layer_norm_on,
    )

    def pull_at(points, R, t, frame_id):
        n = len(points)
        S6, b6, n_valid, n_total = h_reduce(
            system.map_state, system.mlp,
            jnp.asarray(points, jnp.float32), jnp.ones((n,), bool),
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
            system.travel_dist_dev, frame_id, cfg.diff_travel_dist_local,
        )
        S6 = np.asarray(S6, np.float64)
        b6 = np.asarray(b6, np.float64)
        try:
            p = -np.linalg.solve(S6 + 1e-6 * np.eye(6), b6)
        except np.linalg.LinAlgError:
            p = np.zeros(6)
        return p, int(n_valid)

    rng = np.random.default_rng(0)
    for i in range(args.frames):
        if i > 0:
            # probe frame i's scan vs the map of frames 0..i-1
            scan = seq.scans[i]
            sub = scan[rng.permutation(len(scan))[:6000]]
            gt = seq.poses[i]
            gt_prev = seq.poses[i - 1]
            est_prev = system.dataset.odom_poses[i - 1]
            # tangent direction at gt
            p = gt[:3, 3]
            r_hat = np.array([p[0], p[1], 0.0])
            r_hat /= max(np.linalg.norm(r_hat), 1e-9)
            t_hat = np.array([-r_hat[1], r_hat[0], 0.0])
            motion = np.linalg.norm(gt[:3, 3] - gt_prev[:3, 3])

            pg, nv1 = pull_at(sub, gt[:3, :3], gt[:3, 3], i)
            pp, nv2 = pull_at(sub, est_prev[:3, :3], est_prev[:3, 3], i)
            print(
                f"frame {i}: motion {motion*1e3:6.2f} mm | "
                f"pull@GT tang {pg[3:6] @ t_hat * 1e3:+7.2f} mm "
                f"(|t| {np.linalg.norm(pg[3:6])*1e3:6.2f}) | "
                f"pull@prev-est tang {pp[3:6] @ t_hat * 1e3:+7.2f} mm "
                f"(|t| {np.linalg.norm(pp[3:6])*1e3:6.2f}, want +{motion*1e3:.2f})"
            )

        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        x = system.tracker.x
        gt = seq.poses[i]
        # true velocity (secant)
        if i + 1 < args.frames:
            vtrue = (seq.poses[i + 1][:3, 3] - seq.poses[i][:3, 3]) / 0.1
        else:
            vtrue = x.vel
        print(
            f"   post {i}: terr {np.linalg.norm(x.pos - gt[:3, 3])*1e3:7.2f} mm  "
            f"vel {np.asarray(x.vel).round(4)} (true {vtrue.round(4)})  "
            f"ba {np.asarray(x.ba).round(5)}  bg {np.asarray(x.bg).round(6)}  "
            f"grav_z {x.grav[2]:.4f}"
        )


if __name__ == "__main__":
    main()
