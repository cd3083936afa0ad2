#!/usr/bin/env python3
"""Diagnose the large-scale tracking failure (STATUS r3 open bug).

Runs the bench LARGE scenario through the classic host loop and, per frame:
  - decomposes the pose error into along-track / radial / vertical
    components (the hall is rotationally symmetric: along-track is the
    weakly-constrained gauge direction);
  - evaluates the tracker's measurement model at the GT pose vs the
    estimated pose: residual stats by range bin and the single
    Gauss-Newton "pull" dx = -S6^-1 b6 (a biased map pulls the GT pose).

Also (frame 0): compares the sampler's SDF labels against the analytic
SDF of the synthetic world, binned by range — the projective-label /
plane-fit bias hypothesis.

Usage: python scripts/diag_large.py [--frames 25] [--h-frames 3,8,15]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def true_sdf(world, p):
    """Analytic (unsigned-interior) SDF of the synthetic world: positive in
    free space, negative inside solids. Exact for planes; lateral distance
    for cylinders (pillars span the room height)."""
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    rxy = np.sqrt(x * x + y * y)
    d = world.room_radius - rxy  # inside the hall wall
    d = np.minimum(d, z - world.floor_z)
    d = np.minimum(d, world.ceil_z - z)
    for cx, cy, r in world.pillars:
        d = np.minimum(d, np.sqrt((x - cx) ** 2 + (y - cy) ** 2) - r)
    for cx, cy, hx, hy, z0, z1 in getattr(world, "boxes", []):
        c = np.array([cx, cy, 0.5 * (z0 + z1)])
        h = np.array([hx, hy, 0.5 * (z1 - z0)])
        q = np.abs(p - c) - h
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=1)
        inside = np.minimum(np.max(q, axis=1), 0.0)
        d = np.minimum(d, outside + inside)
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--h-frames", default="3,8,15,22")
    ap.add_argument("--labels", action="store_true", help="frame-0 label audit")
    args = ap.parse_args()
    h_frames = {int(s) for s in args.h_frames.split(",") if s}

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench as B
    from clid_slam_tpu.odometry import iekf
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    seq = B.make_sequence(True, args.frames)
    world = seq.world

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

    def h_probe(points_imu, mask, R, t, frame_id, label):
        """One measurement evaluation at pose (R, t): GN pull + residuals."""
        S6, b6, n_valid, n_total = h_reduce(
            system.map_state, system.mlp, jnp.asarray(points_imu),
            jnp.asarray(mask), jnp.asarray(R, jnp.float32),
            jnp.asarray(t, jnp.float32),
            system.travel_dist_dev,
            frame_id,
            cfg.diff_travel_dist_local,
        )
        S6 = np.asarray(S6, np.float64)
        b6 = np.asarray(b6, np.float64)
        pull = np.zeros(6)
        try:
            pull = -np.linalg.solve(S6 + 1e-6 * np.eye(6), b6)
        except np.linalg.LinAlgError:
            pass
        ev = np.linalg.eigvalsh(S6[3:6, 3:6])
        print(
            f"    h[{label}]: n_valid {int(n_valid)}/{int(n_total)}  "
            f"pull_rot {np.degrees(np.linalg.norm(pull[:3])):.4f} deg  "
            f"pull_tran {pull[3:6].round(4)}  |t| {np.linalg.norm(pull[3:6]):.4f} m  "
            f"S_tran eig {ev.round(0)}"
        )
        return pull

    for i in range(args.frames):
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        gt = seq.poses[i]
        est = system.dataset.odom_poses[i]
        e = est[:3, 3] - gt[:3, 3]
        # tangent = motion direction (yaw+90 on the circle); radial = outward
        p = gt[:3, 3]
        r_hat = np.array([p[0], p[1], 0.0])
        r_hat /= max(np.linalg.norm(r_hat), 1e-9)
        t_hat = np.array([-r_hat[1], r_hat[0], 0.0])
        yaw_err = np.degrees(
            np.arctan2(
                (gt[:3, :3].T @ est[:3, :3])[1, 0],
                (gt[:3, :3].T @ est[:3, :3])[0, 0],
            )
        )
        print(
            f"frame {i:3d}: |e| {np.linalg.norm(e):7.4f} m  "
            f"tang {e @ t_hat:+8.4f}  rad {e @ r_hat:+8.4f}  "
            f"z {e[2]:+8.4f}  yaw {yaw_err:+7.3f} deg  "
            f"pts {int(system.map_state.count)}"
        )
        if i in h_frames:
            # the SOURCE cloud of this frame (sensor/IMU frame) vs map
            src = system.dataset.cur_source_points
            smask = system.dataset.cur_source_mask
            h_probe(src, smask, gt[:3, :3], gt[:3, 3], i, "GT ")
            h_probe(src, smask, est[:3, :3], est[:3, 3], i, "est")

    if args.labels:
        audit_labels(system, seq, world, cfg)


def audit_labels(system, seq, world, cfg):
    """Compare frame-0 training labels against the analytic world SDF."""
    import jax
    import jax.numpy as jnp

    from clid_slam_tpu.mapping.sampler import sample_rays

    pts = seq.scans[0]
    n = len(pts)
    batch = sample_rays(
        jax.random.PRNGKey(0),
        jnp.asarray(pts),
        jnp.ones((n,), bool),
        jnp.asarray(seq.poses[0], jnp.float32),
        system.local_map,
        cfg.local_voxel_size_m,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_front_n=cfg.free_front_n,
        free_behind_n=cfg.free_behind_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        max_range=cfg.max_range,
        dist_weight_on=cfg.dist_weight_on,
        dist_weight_scale=cfg.dist_weight_scale,
    )
    coords = np.asarray(batch.coords)
    gpose = seq.poses[0]
    gcoords = coords @ gpose[:3, :3].T + gpose[:3, 3]
    lbl = np.asarray(batch.sdf_label)
    msk = np.asarray(batch.mask)
    w = np.asarray(batch.weight)
    tsdf = true_sdf(world, gcoords)
    rng_ = np.linalg.norm(coords, axis=1)
    surf = msk & (w > 0) & (np.abs(lbl) < cfg.surface_sample_range_m * 4)
    print("\nsurface-sample label error vs analytic SDF, by range bin:")
    for lo, hi in [(0, 10), (10, 20), (20, 30), (30, 40), (40, 50), (50, 62)]:
        sel = surf & (rng_ >= lo) & (rng_ < hi)
        if sel.sum() < 10:
            continue
        err = lbl[sel] - tsdf[sel]
        print(
            f"  [{lo:2d},{hi:2d}) m: n {sel.sum():6d}  "
            f"bias {err.mean():+.4f}  |err| median {np.median(np.abs(err)):.4f}  "
            f"p90 {np.quantile(np.abs(err), 0.9):.4f}"
        )


if __name__ == "__main__":
    main()
