#!/usr/bin/env python3
"""Pure field inspection: where is the learned zero-set relative to the
analytic surfaces, as a function of how many motion frames the map has
seen? Builds oracle-GT maps from frames 0..K for K in (14, 15, 18) and
probes 1-D SDF profiles through: the hall wall ahead / behind (along the
motion direction), and the nearest box face. Reports zero-crossing offset
(positive = zero-set displaced along +motion)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def profile_offset(sdf_at, x0, d, lo=-0.30, hi=0.30, n=121):
    """Zero crossing of SDF along x0 + s*d, s in [lo, hi] (meters)."""
    import jax.numpy as jnp

    ss = np.linspace(lo, hi, n)
    pts = x0[None] + ss[:, None] * d[None]
    sv, nnc = sdf_at(jnp.asarray(pts, jnp.float32))
    sv = np.asarray(sv)
    # first sign change scanning outward-to-inward
    z = None
    for i in range(n - 1):
        if sv[i] > 0 >= sv[i + 1] or sv[i] < 0 <= sv[i + 1]:
            frac = sv[i] / (sv[i] - sv[i + 1])
            z = ss[i] + frac * (ss[1] - ss[0])
            break
    return z, sv


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    seq = B.make_sequence(True, 20)
    world = seq.world

    for K in (15, 16, 19):
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
        for i in range(K):
            system.process_frame(i, seq.scans[i], seq.imu_windows[i])

        st = system
        FQ = K

        @jax.jit
        def sdf_at(points_world):
            q = nm.query_feature(
                st.map_state, points_world, st.nb_offs,
                cfg.voxel_size_m, st.max_valid_dist2, cfg.query_nn_k,
                st.travel_dist_dev, FQ, cfg.diff_travel_dist_local, True,
                encode_vecs=st.encode_vecs,
                weighted_first=cfg.weighted_first,
                layer_norm=cfg.layer_norm_on,
            )
            pred = dec.sdf(
                st.mlp, q.feature, cfg.sdf_scale,
                leaky=cfg.mlp_leaky_relu, bf16=cfg.mlp_bf16,
            )
            return pred, q.nn_count

        gt = seq.poses[K - 1]
        p = gt[:3, 3]
        r_hat = np.array([p[0], p[1], 0.0])
        r_hat /= np.linalg.norm(r_hat)
        t_hat = np.array([-r_hat[1], r_hat[0], 0.0])  # motion direction

        # hall wall intersections along +/- tangent from p (z at sensor)
        # solve |p + s t| = R_room
        R_ = world.room_radius
        b = 2 * p[:2] @ t_hat[:2]
        c = p[:2] @ p[:2] - R_ * R_
        s_ahead = (-b + np.sqrt(b * b - 4 * c)) / 2
        s_behind = (-b - np.sqrt(b * b - 4 * c)) / 2
        wall_ahead = p + s_ahead * t_hat
        wall_behind = p + s_behind * t_hat

        total_motion = np.linalg.norm(p - seq.poses[0][:3, 3])
        print(f"\nmap 0..{K-1} (total motion {total_motion*1e3:.0f} mm):")
        for name, x0, d in [
            ("wall_ahead ", wall_ahead, t_hat),
            ("wall_behind", wall_behind, t_hat),
        ]:
            z, sv = profile_offset(sdf_at, x0, d)
            # analytic zero is at s=0 by construction
            print(
                f"  {name}: zero at {z*1e3 if z is not None else float('nan'):+8.1f} mm along +motion   "
                f"sdf(-0.2) {sv[20]:+.3f} sdf(0) {sv[60]:+.3f} sdf(+0.2) {sv[100]:+.3f}"
            )


if __name__ == "__main__":
    main()
