#!/usr/bin/env python3
"""Clean-map registration test at ramp motion scale: build the map with
EXACT GT poses (tracking replaced by an oracle), then sweep the robust
cost of frame 18's scan (motion ~50 mm) tangentially around GT-18.

If the minimum sits at GT: registration is healthy on a clean map and the
instability is purely closed-loop (error-seeded). If it lags: the SDF map
itself biases scan-to-map registration backward even when built perfectly.
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
        def f(pts):
            qq = nm.query_feature(
                system.map_state, pts, system.nb_offs,
                cfg.voxel_size_m, system.max_valid_dist2, cfg.query_nn_k,
                system.travel_dist_dev, F, cfg.diff_travel_dist_local, True,
                encode_vecs=system.encode_vecs,
                weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
            )
            pr = dec.sdf(
                system.mlp, qq.feature, cfg.sdf_scale,
                leaky=cfg.mlp_leaky_relu, bf16=cfg.mlp_bf16,
            )
            return jnp.sum(pr), (pr, qq.nn_count, qq.certainty)
        grad, (pred, nnc, cert) = jax.grad(f, has_aux=True)(points_world)
        return pred, nnc, cert, grad

    def _unused(points_world):
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
        return pred, q.nn_count, q.certainty

    rng = np.random.default_rng(0)
    scan = seq.scans[F]
    sub = scan[rng.permutation(len(scan))[:10000]]
    gt = seq.poses[F]
    motion = np.linalg.norm(gt[:3, 3] - seq.poses[F - 1][:3, 3])
    p = gt[:3, 3]
    r_hat = np.array([p[0], p[1], 0.0])
    r_hat /= np.linalg.norm(r_hat)
    t_hat = np.array([-r_hat[1], r_hat[0], 0.0])

    def cost(off, mode):
        pw = sub @ gt[:3, :3].T + (gt[:3, 3] + off)
        sv, nnc, cert, grad = sdf_at(jnp.asarray(pw, jnp.float32))
        sv = np.asarray(sv)
        grad = np.asarray(grad)
        ok = np.asarray(nnc) >= cfg.track_mask_query_nn_k
        if mode.startswith("rng"):
            thr = float(mode.split("-")[1])
            rr = np.linalg.norm(sub, axis=1)
            ok = ok & (rr <= thr)
            w = 0.4 / (0.4 + sv**2)
            return float(np.sum(w[ok] * sv[ok] ** 2)) / max(ok.sum(), 1)
        if mode.startswith("inc"):
            thr = float(mode.split("-")[1])
            gn = grad / np.maximum(np.linalg.norm(grad, axis=1, keepdims=True), 1e-9)
            dirs = sub @ gt[:3, :3].T
            dirs = dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-9)
            cosi = np.abs(np.sum(gn * dirs, axis=1))
            ok = ok & (cosi >= thr)
            w = 0.4 / (0.4 + sv**2)
            return float(np.sum(w[ok] * sv[ok] ** 2)) / max(ok.sum(), 1)
        if mode.startswith("cert"):
            thr = float(mode.split("-")[1])
            ok = ok & (np.asarray(cert) >= thr)
            w = 0.4 / (0.4 + sv**2)
            return float(np.sum(w[ok] * sv[ok] ** 2)) / max(ok.sum(), 1)
        if mode == "robust":
            w = 0.4 / (0.4 + sv**2)
            return float(np.sum(w[ok] * sv[ok] ** 2))
        if mode == "l2":
            return float(np.sum(sv[ok] ** 2))
        if mode == "huber":  # delta = 0.05 m
            a = np.abs(sv[ok]); d = 0.05
            return float(np.sum(np.where(a < d, 0.5 * a * a, d * (a - 0.5 * d))))
        if mode == "l1":
            return float(np.sum(np.abs(sv[ok])))

    print(f"frame {F}: motion {motion*1e3:.1f} mm; sweep around GT:")
    for mode in ("robust", "rng-15", "rng-25", "rng-35"):
        for axis, name in [(t_hat, "tang")]:
            ss = np.linspace(-0.06, 0.06, 31)
            cs = [cost(s * axis, mode) for s in ss]
            k = int(np.argmin(cs))
            if 0 < k < len(ss) - 1:
                a, b, c = cs[k - 1], cs[k], cs[k + 1]
                smin = ss[k] + 0.5 * (a - c) / (a - 2 * b + c) * (ss[1] - ss[0])
            else:
                smin = ss[k]
            print(f"  {mode:6s} {name}: min {smin*1e3:+7.2f} mm")


if __name__ == "__main__":
    main()
