#!/usr/bin/env python3
"""Test the ray-grid pinning hypothesis: if frame 1's scan is generated
with a DIFFERENT azimuth phase than frame 0 (as a real spinning LiDAR
does), does the registration cost minimum move from ~50% recovery to the
true pose?
"""

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
    from clid_slam_tpu.pipeline.synthetic import large_world

    cfg = B.build_config(large=True)
    seq = B.make_sequence(True, 4)
    world = seq.world

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")
    system.process_frame(0, seq.scans[0], seq.imu_windows[0])

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

    # regenerate frame 1's scan with a phase-shifted azimuth grid
    def scan_at(pose, az_phase, n_az=1024, n_el=32, el_phase=0.0):
        az = (
            np.linspace(-np.pi, np.pi, n_az, endpoint=False)
            + az_phase * 2 * np.pi / n_az
        )
        el = np.linspace(np.deg2rad(-22.5), np.deg2rad(22.5), n_el)
        if el_phase:
            el = el + el_phase * (el[1] - el[0])
        A, E = np.meshgrid(az, el, indexing="ij")
        d = np.stack(
            [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
        ).reshape(-1, 3)
        R, p = pose[:3, :3], pose[:3, 3]
        t = world.raycast(p, d @ R.T)
        hit = np.isfinite(t) & (t < 60.0) & (t > 0.5)
        pts = d[hit] * t[hit][:, None]
        rng = np.random.default_rng(1234)
        return (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)

    gt = seq.poses[1]
    p = gt[:3, 3]
    r_hat = np.array([p[0], p[1], 0.0])
    r_hat /= np.linalg.norm(r_hat)
    t_hat = np.array([-r_hat[1], r_hat[0], 0.0])
    motion = np.linalg.norm(gt[:3, 3] - seq.poses[0][:3, 3])
    sub_rng = np.random.default_rng(0)

    def sweep(scan, label):
        sub = scan[sub_rng.permutation(len(scan))[:8000]]

        def cost(off):
            pw = sub @ gt[:3, :3].T + (gt[:3, 3] + off)
            s, nnc = sdf_at(jnp.asarray(pw, jnp.float32))
            s = np.asarray(s)
            ok = np.asarray(nnc) >= cfg.track_mask_query_nn_k
            w = 0.4 / (0.4 + s**2)
            return float(np.sum(w[ok] * s[ok] ** 2))

        ss = np.linspace(-0.012, 0.012, 25)
        cs = [cost(s * t_hat) for s in ss]
        k = int(np.argmin(cs))
        if 0 < k < len(ss) - 1:
            a, b, c = cs[k - 1], cs[k], cs[k + 1]
            smin = ss[k] + 0.5 * (a - c) / (a - 2 * b + c) * (ss[1] - ss[0])
        else:
            smin = ss[k]
        print(
            f"  {label}: tang min {smin*1e3:+.3f} mm "
            f"(true motion {motion*1e3:.2f} mm; 0 = full recovery)"
        )

    print("frame-1 tangential cost minimum vs azimuth phase of its scan:")
    sweep(scan_at(gt, 0.0), "phase 0.00 (bench today)")
    sweep(scan_at(gt, 0.25), "phase 0.25")
    sweep(scan_at(gt, 0.50), "phase 0.50")
    sweep(scan_at(gt, 0.50, el_phase=0.5), "phase 0.50 + el 0.5")


if __name__ == "__main__":
    main()
