#!/usr/bin/env python3
"""Locate the registration cost minimum directly (no GN) and decompose it.

Map = frame 0 only (built at GT). For frame 1 (and 2 with frame-1 skipped
so the map stays clean): sweep the robust SDF cost along the tangent /
radial / z axes around the GT pose and print the interpolated minimum.
Also classify scan points by the analytic surface they hit (wall / floor /
ceiling / pillar) and report each class's mean signed SDF at GT and its
tangential pull contribution.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def classify(world, p_world):
    """Nearest-surface class per point: 0 wall, 1 floor, 2 ceil, 3 pillar."""
    x, y, z = p_world[:, 0], p_world[:, 1], p_world[:, 2]
    rxy = np.sqrt(x * x + y * y)
    d = np.stack(
        [
            np.abs(world.room_radius - rxy),
            np.abs(z - world.floor_z),
            np.abs(world.ceil_z - z),
        ],
        1,
    )
    dp = np.full(len(p_world), 1e9)
    for cx, cy, r in world.pillars:
        dp = np.minimum(dp, np.abs(np.sqrt((x - cx) ** 2 + (y - cy) ** 2) - r))
    d = np.concatenate([d, dp[:, None]], 1)
    return np.argmin(d, 1)


def main():
    import jax.numpy as jnp

    import bench as B
    from clid_slam_tpu.odometry import iekf
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    seq = B.make_sequence(True, 4)
    world = seq.world

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")
    system.process_frame(0, seq.scans[0], seq.imu_windows[0])

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

    # raw per-point SDF evaluation (reuse h_reduce internals via jax):
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm

    import jax

    @jax.jit
    def sdf_at(points_world):
        q = nm.query_feature(
            system.map_state, points_world, system.nb_offs,
            cfg.voxel_size_m, system.max_valid_dist2, cfg.query_nn_k,
            system.travel_dist_dev, 1, cfg.diff_travel_dist_local, True,
            encode_vecs=system.encode_vecs,
            weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        )
        pred = dec.sdf(
            system.mlp, q.feature, cfg.sdf_scale,
            leaky=cfg.mlp_leaky_relu, bf16=cfg.mlp_bf16,
        )
        return pred, q.nn_count

    rng = np.random.default_rng(0)
    i = 1
    scan = seq.scans[i]
    sub = scan[rng.permutation(len(scan))[:8000]]
    gt = seq.poses[i]
    p = gt[:3, 3]
    r_hat = np.array([p[0], p[1], 0.0])
    r_hat /= np.linalg.norm(r_hat)
    t_hat = np.array([-r_hat[1], r_hat[0], 0.0])
    z_hat = np.array([0.0, 0.0, 1.0])

    def robust_cost(t_off):
        """Tracker-equivalent robust cost at GT pose + t_off (world)."""
        pw = sub @ gt[:3, :3].T + (gt[:3, 3] + t_off)
        s, nnc = sdf_at(jnp.asarray(pw, jnp.float32))
        s = np.asarray(s)
        ok = np.asarray(nnc) >= cfg.track_mask_query_nn_k
        w = 0.4 / (0.4 + s**2)
        return float(np.sum(w[ok] * s[ok] ** 2)), s, ok

    print("1-D robust-cost sweeps around GT (frame 1, map = frame 0 only):")
    for name, axis in [("tang", t_hat), ("rad", r_hat), ("z", z_hat)]:
        ss = np.linspace(-0.012, 0.012, 25)
        cs = [robust_cost(s * axis)[0] for s in ss]
        k = int(np.argmin(cs))
        # parabola refine
        if 0 < k < len(ss) - 1:
            a, b, c = cs[k - 1], cs[k], cs[k + 1]
            frac = 0.5 * (a - c) / (a - 2 * b + c)
            smin = ss[k] + frac * (ss[1] - ss[0])
        else:
            smin = ss[k]
        print(f"  {name}: min at {smin*1e3:+.3f} mm (grid {ss[k]*1e3:+.2f})")

    motion = np.linalg.norm(gt[:3, 3] - seq.poses[0][:3, 3])
    print(f"  (true inter-frame motion: {motion*1e3:.2f} mm)")

    # per-class residual decomposition at the GT pose
    _, s_gt, ok = robust_cost(np.zeros(3))
    pw = sub @ gt[:3, :3].T + gt[:3, 3]
    cls = classify(world, pw)
    names = ["wall", "floor", "ceil", "pillar"]
    rngs = np.linalg.norm(sub, axis=1)
    print("\nper-class signed SDF at GT pose (map = frame 0):")
    for c in range(4):
        sel = ok & (cls == c)
        if sel.sum() < 5:
            continue
        print(
            f"  {names[c]:6s}: n {sel.sum():5d}  mean {s_gt[sel].mean():+.4f}"
            f"  med {np.median(s_gt[sel]):+.4f}  rng_med {np.median(rngs[sel]):5.1f} m"
        )
    # range-binned floor stats (grazing incidence suspect)
    print("\nfloor SDF at GT by range bin:")
    for lo, hi in [(0, 10), (10, 20), (20, 30), (30, 45), (45, 62)]:
        sel = ok & (cls == 1) & (rngs >= lo) & (rngs < hi)
        if sel.sum() < 5:
            continue
        print(
            f"  [{lo:2d},{hi:2d}): n {sel.sum():5d}  mean {s_gt[sel].mean():+.4f}"
            f"  med {np.median(s_gt[sel]):+.4f}"
        )


if __name__ == "__main__":
    main()
