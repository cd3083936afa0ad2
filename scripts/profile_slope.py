#!/usr/bin/env python3
"""Per-iteration cost slopes: time mapping at iters={1,5,10,20} and the
cached tracker at max_iteration={1,5,15,30}, plus probe/insert pieces, to
see what inside each loop burns the time.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_slope.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.odometry import iekf
from clid_slam_tpu.ops.voxel import voxel_down_sample_mask
from clid_slam_tpu.pipeline.streaming import StreamingSlam
from clid_slam_tpu.pipeline.synthetic import generate_sequence


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    n_frames = 12
    cfg = bench.build_config()
    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    st = system.state
    fid = jnp.asarray(n_frames - 1, jnp.int32)
    window = cfg.diff_travel_dist_local
    nb_offs = system.nb_offs
    encode_vecs = system.encode_vecs
    max_valid_dist2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
    key = jax.random.PRNGKey(0)

    # ---- mapping slope over iters (R=10 → one probe regardless)
    mapping_fn = mp.make_mapping_fn(
        feature_dim=cfg.feature_dim, knn_k=cfg.query_nn_k, nb_offs=nb_offs,
        resolution=cfg.voxel_size_m, max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale, sigma=cfg.sdf_scale, bs=cfg.bs,
        bs_new=cfg.bs_new_sample,
        gradient_decimation=cfg.gradient_decimation,
        num_grad_eps=cfg.num_grad_eps, weight_e=cfg.weight_e,
        loss_weight_on=cfg.loss_weight_on, lr=cfg.lr, adam_eps=cfg.adam_eps,
        encode_vecs=encode_vecs, weighted_first=cfg.weighted_first,
        layer_norm=cfg.layer_norm_on, resample_every=1000)
    for it in (1, 5, 10, 20):
        t = timeit(lambda: mapping_fn(
            jax.tree.map(jnp.copy, st.map_state), st.mlp, st.color_mlp,
            st.sem_mlp, st.pool, st.travel_dist, fid, window, key,
            jnp.asarray(it, jnp.int32), jnp.asarray(1.0, jnp.float32)))
        print(f"mapping iters={it:3d} (1 probe): {t:7.2f} ms", flush=True)

    # batch-size slope at iters=10
    for bs in (4096, 16384):
        mf = mp.make_mapping_fn(
            feature_dim=cfg.feature_dim, knn_k=cfg.query_nn_k,
            nb_offs=nb_offs, resolution=cfg.voxel_size_m,
            max_valid_dist2=max_valid_dist2, sdf_scale=cfg.sdf_scale,
            sigma=cfg.sdf_scale, bs=bs, bs_new=cfg.bs_new_sample,
            gradient_decimation=cfg.gradient_decimation,
            num_grad_eps=cfg.num_grad_eps, weight_e=cfg.weight_e,
            loss_weight_on=cfg.loss_weight_on, lr=cfg.lr,
            adam_eps=cfg.adam_eps, encode_vecs=encode_vecs,
            weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
            resample_every=1000)
        t = timeit(lambda: mf(
            jax.tree.map(jnp.copy, st.map_state), st.mlp, st.color_mlp,
            st.sem_mlp, st.pool, st.travel_dist, fid, window, key,
            jnp.asarray(10, jnp.int32), jnp.asarray(1.0, jnp.float32)))
        print(f"mapping bs={bs:6d} iters=10: {t:7.2f} ms", flush=True)

    # ---- tracker slope over max_iteration
    S = cfg.max_source_points
    points = np.zeros((cfg.max_scan_points, 3), np.float32)
    m = min(len(seq.scans[-1]), cfg.max_scan_points)
    points[:m] = seq.scans[-1][:m, :3]
    pj = jnp.asarray(points)
    pmask = jnp.arange(cfg.max_scan_points) < m

    @jax.jit
    def f_source(points, pmask):
        tm = voxel_down_sample_mask(points, pmask, cfg.vox_down_m,
                                    cfg.map_hash_size)
        sm = voxel_down_sample_mask(points, tm, cfg.source_vox_down_m,
                                    cfg.map_hash_size)
        n_src = jnp.sum(sm.astype(jnp.int32))
        (si,) = jnp.nonzero(sm, size=S, fill_value=0)
        return points[si], jnp.arange(S) < n_src

    src_pts, smask = f_source(pj, pmask)
    for mi in (1, 5, 15, 30):
        upd = jax.jit(iekf.make_cached_update_fn(
            knn_k=cfg.query_nn_k, n_cand=16, nb_offs=nb_offs,
            resolution=cfg.voxel_size_m, max_valid_dist2=max_valid_dist2,
            sdf_scale=cfg.sdf_scale, min_grad_norm=0.0,
            max_grad_norm=1e9, min_nn_count=1, max_iteration=mi,
            term_thre_deg=0.0, term_thre_m=0.0,  # never converge early
            encode_vecs=encode_vecs, weighted_first=cfg.weighted_first,
            layer_norm=cfg.layer_norm_on, stagnation_iter=10**6))
        t = timeit(upd, st.map_state, st.mlp, src_pts, smask, st.rot,
                   st.pos, st.rest, st.P, st.travel_dist, fid, window)
        print(f"tracker cached iters={mi:3d}: {t:7.2f} ms", flush=True)

    # ---- probe alone at mapping batch size
    idx = jax.random.randint(key, (cfg.bs,), 0, int(st.pool.size))
    coords = st.pool.coords[idx]

    @jax.jit
    def f_probe(ms, coords):
        return nm.neighborhood_probe(
            ms, coords, nb_offs, cfg.voxel_size_m, max_valid_dist2,
            st.travel_dist, fid, window, True)

    print(f"probe [16384 x {nb_offs.shape[0]}]: "
          f"{timeit(f_probe, st.map_state, coords):7.2f} ms", flush=True)

    # top_k alone on the probe output
    d2, h, pv, mir = f_probe(st.map_state, coords)

    @jax.jit
    def f_topk(d2, pv):
        return jax.lax.top_k(-jnp.where(pv, d2, 9e3), cfg.query_nn_k)

    print(f"top_k(6) over [16384 x {nb_offs.shape[0]}]: "
          f"{timeit(f_topk, d2, pv):7.2f} ms", flush=True)

    # dense feats gather at [16384,6]
    sel = f_topk(d2, pv)[1]
    h_sel = jnp.take_along_axis(h, sel, axis=1)

    @jax.jit
    def f_gather6(ms, h_sel):
        idx = ms.hash_table[h_sel]
        return ms.geo_feats[jnp.where(idx >= 0, idx, 0)]

    print(f"idx+feat gather [16384 x 6]: "
          f"{timeit(f_gather6, st.map_state, h_sel):7.2f} ms", flush=True)

    # adam full-slab update cost
    g = jax.tree.map(jnp.zeros_like, st.map_state.geo_feats)

    @jax.jit
    def f_adam(p, g, m, v):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return p - 0.01 * m / (jnp.sqrt(v) + 1e-15), m, v

    print(f"adam full slab [2^20 x 8]: "
          f"{timeit(f_adam, st.map_state.geo_feats, g, g, g):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
