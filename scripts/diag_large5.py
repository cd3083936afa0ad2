#!/usr/bin/env python3
"""Frame-16 cost anatomy on the hold-built map (new large scenario).

Run frames 0..15 (static hold). Then for frame 16 (first motion, +10 mm):
sweep the robust SDF cost along the tangent from the frame-15 estimated
pose, total and per analytic surface class, and report each class's
interpolated minimum + valid fraction. If pillar/wall-ahead classes pin to
s=0, the map is biased at their surfaces; if their minima sit at +10 mm but
the total pins, it's a weighting problem.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from diag_large3 import classify  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench as B
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    N = 17
    seq = B.make_sequence(True, N)
    world = seq.world

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")
    for i in range(16):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])

    est15 = system.dataset.odom_poses[15]
    gt16 = seq.poses[16]
    print(
        f"est15 err: {np.linalg.norm(est15[:3,3]-seq.poses[15][:3,3])*1e3:.2f} mm; "
        f"frame-16 motion {np.linalg.norm(gt16[:3,3]-seq.poses[15][:3,3])*1e3:.2f} mm"
    )

    @jax.jit
    def sdf_at(points_world):
        q = nm.query_feature(
            system.map_state, points_world, system.nb_offs,
            cfg.voxel_size_m, system.max_valid_dist2, cfg.query_nn_k,
            system.travel_dist_dev, 16, cfg.diff_travel_dist_local, True,
            encode_vecs=system.encode_vecs,
            weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        )
        pred = dec.sdf(
            system.mlp, q.feature, cfg.sdf_scale,
            leaky=cfg.mlp_leaky_relu, bf16=cfg.mlp_bf16,
        )
        return pred, q.nn_count

    rng = np.random.default_rng(0)
    scan = seq.scans[16]
    sub = scan[rng.permutation(len(scan))[:10000]]
    p = gt16[:3, 3]
    r_hat = np.array([p[0], p[1], 0.0])
    r_hat /= np.linalg.norm(r_hat)
    t_hat = np.array([-r_hat[1], r_hat[0], 0.0])

    # classify by surface and by whether the surface normal has a
    # significant tangential component (what constrains along-track)
    pw_gt = sub @ gt16[:3, :3].T + gt16[:3, 3]
    cls = classify(world, pw_gt)
    names = ["wall", "floor", "ceil", "pillar"]

    ss = np.linspace(-0.006, 0.016, 23)
    costs = {c: [] for c in range(4)}
    total = []
    nvalid_at0 = None
    for s in ss:
        pw = sub @ est15[:3, :3].T + (est15[:3, 3] + s * t_hat)
        sv, nnc = sdf_at(jnp.asarray(pw, jnp.float32))
        sv = np.asarray(sv)
        ok = np.asarray(nnc) >= cfg.track_mask_query_nn_k
        w = 0.4 / (0.4 + sv**2)
        j = w * sv**2
        total.append(float(np.sum(j[ok])))
        for c in range(4):
            sel = ok & (cls == c)
            costs[c].append(float(np.sum(j[sel])))
        if abs(s) < 1e-9:
            nvalid_at0 = ok

    def report(name, cs):
        cs = np.asarray(cs)
        k = int(np.argmin(cs))
        if 0 < k < len(ss) - 1:
            a, b, c = cs[k - 1], cs[k], cs[k + 1]
            smin = ss[k] + 0.5 * (a - c) / (a - 2 * b + c) * (ss[1] - ss[0])
        else:
            smin = ss[k]
        # curvature around the min (info per meter^2)
        print(
            f"  {name:7s}: min at {smin*1e3:+7.2f} mm   "
            f"J(0) {cs[np.argmin(np.abs(ss))]:9.1f}  J(min) {cs[k]:9.1f}"
        )

    print("\ntangential cost sweep from est15 (true min should be ~ +10 mm):")
    report("TOTAL", total)
    for c in range(4):
        report(names[c], costs[c])

    for c in range(4):
        sel = cls == c
        print(
            f"  {names[c]:7s}: n {sel.sum():5d}  valid@0 "
            f"{(nvalid_at0 & sel).sum() / max(sel.sum(),1):.2f}"
        )


if __name__ == "__main__":
    main()
