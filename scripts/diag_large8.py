#!/usr/bin/env python3
"""Where does the backward pull live? Per-point robust-cost difference
between placing frame-19's scan at GT vs GT-40mm (the lagged minimum),
binned by ray azimuth relative to the motion direction and by range,
plus mean signed SDF at both placements per bin."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    F = 19
    seq = B.make_sequence(True, F + 1)

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")

    def oracle_track(frame_id):
        gt = seq.poses[frame_id]
        system.tracker.x.rot = gt[:3, :3].copy()
        system.tracker.x.pos = gt[:3, 3].copy()
        system.dataset.lose_track = False
        system.dataset.update_odom_pose(system.tracker.x.pose_matrix())
        return True

    system._track = oracle_track
    for i in range(F):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])

    @jax.jit
    def sdf_at(points_world):
        q = nm.query_feature(
            system.map_state, points_world, system.nb_offs,
            cfg.voxel_size_m, system.max_valid_dist2, cfg.query_nn_k,
            system.travel_dist_dev, F, cfg.diff_travel_dist_local, True,
            encode_vecs=system.encode_vecs,
            weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        )
        pred = dec.sdf(
            system.mlp, q.feature, cfg.sdf_scale,
            leaky=cfg.mlp_leaky_relu, bf16=cfg.mlp_bf16,
        )
        return pred, q.nn_count

    rng = np.random.default_rng(0)
    scan = seq.scans[F]
    sub = scan[rng.permutation(len(scan))[:16000]]
    gt = seq.poses[F]
    p = gt[:3, 3]
    r_hat = np.array([p[0], p[1], 0.0])
    r_hat /= np.linalg.norm(r_hat)
    t_hat = np.array([-r_hat[1], r_hat[0], 0.0])

    def eval_at(off):
        pw = sub @ gt[:3, :3].T + (gt[:3, 3] + off)
        sv, nnc = sdf_at(jnp.asarray(pw, jnp.float32))
        sv = np.asarray(sv)
        ok = np.asarray(nnc) >= cfg.track_mask_query_nn_k
        w = 0.4 / (0.4 + sv**2)
        return w * sv**2 * ok, sv, ok

    j_gt, s_gt, ok_gt = eval_at(np.zeros(3))
    j_lag, s_lag, ok_lag = eval_at(-0.040 * t_hat)

    # azimuth of each ray relative to the world tangent direction
    dirs_w = (sub / np.linalg.norm(sub, axis=1, keepdims=True)) @ gt[:3, :3].T
    az = np.degrees(
        np.arctan2(dirs_w @ r_hat, dirs_w @ t_hat)
    )  # 0 = forward (motion dir), +/-180 = backward
    rngs = np.linalg.norm(sub, axis=1)

    print("Δcost = j(GT) - j(GT-40mm)  (positive => prefers lagged pose)")
    print("by |azimuth| from motion direction:")
    for lo, hi in [(0, 30), (30, 60), (60, 90), (90, 120), (120, 150), (150, 180)]:
        sel = (np.abs(az) >= lo) & (np.abs(az) < hi) & ok_gt & ok_lag
        if sel.sum() < 20:
            continue
        print(
            f"  [{lo:3d},{hi:3d}): n {sel.sum():5d}  dJ {np.sum(j_gt[sel]-j_lag[sel]):+8.3f}  "
            f"s@GT {s_gt[sel].mean():+.4f}  s@lag {s_lag[sel].mean():+.4f}  "
            f"|s|@GT {np.abs(s_gt[sel]).mean():.4f}  |s|@lag {np.abs(s_lag[sel]).mean():.4f}"
        )
    print("by range:")
    for lo, hi in [(0, 10), (10, 20), (20, 35), (35, 62)]:
        sel = (rngs >= lo) & (rngs < hi) & ok_gt & ok_lag
        if sel.sum() < 20:
            continue
        print(
            f"  [{lo:3d},{hi:3d}): n {sel.sum():5d}  dJ {np.sum(j_gt[sel]-j_lag[sel]):+8.3f}  "
            f"|s|@GT {np.abs(s_gt[sel]).mean():.4f}  |s|@lag {np.abs(s_lag[sel]).mean():.4f}"
        )


if __name__ == "__main__":
    main()
