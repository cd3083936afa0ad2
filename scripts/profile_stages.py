#!/usr/bin/env python3
"""Per-stage device-time breakdown of the streaming frame step at bench
scale: tracking update, prep (split into local-map / sampler / insert /
novelty / pool), and the mapping loop — each timed as its own jitted call
on a steady-state system snapshot.

Run: PYTHONPATH=. python scripts/profile_stages.py [frames]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import bench
from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping import prep as prp
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.odometry import iekf
from clid_slam_tpu.pipeline.streaming import StreamingSlam
from clid_slam_tpu.pipeline.synthetic import generate_sequence
from clid_slam_tpu.utils.transforms import crop_mask, deskew, transform_points
from clid_slam_tpu.ops.voxel import voxel_down_sample_mask


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
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cfg = bench.build_config()
    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    print("# warming up system to steady state...", file=sys.stderr)
    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    st = system.state
    fid = jnp.asarray(n_frames - 1, jnp.int32)
    window = cfg.diff_travel_dist_local

    # rebuild the same sub-functions the fused step uses
    nb_offs = system.nb_offs
    encode_vecs = system.encode_vecs
    max_valid_dist2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
    max_sdf_std = cfg.surface_sample_range_m * cfg.max_sdf_std_ratio

    # ------------------------------------------------ frame inputs (steady)
    pts = seq.scans[-1]
    p_cap = cfg.max_scan_points
    buf = np.zeros((p_cap, 3), np.float32)
    n = min(len(pts), p_cap)
    buf[:n] = pts[:n, :3]
    mask = np.zeros(p_cap, bool)
    mask[:n] = True
    points = jnp.asarray(buf)
    pmask = jnp.asarray(mask)
    pose = st.odom_poses[n_frames - 1]

    @jax.jit
    def f_preproc(points, pmask):
        m = pmask & crop_mask(points, cfg.min_z, cfg.max_z, cfg.min_range,
                              cfg.max_range)
        return voxel_down_sample_mask(points, m, cfg.vox_down_m,
                                      cfg.map_hash_size)

    train_mask = f_preproc(points, pmask)

    # -------------------------------------------------------------- track
    n_cand = cfg.track_n_cand or max(16, cfg.query_nn_k * 2)
    upd = jax.jit(iekf.make_cached_update_fn(
        knn_k=cfg.query_nn_k, n_cand=n_cand, nb_offs=nb_offs,
        resolution=cfg.voxel_size_m, max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale, min_grad_norm=cfg.reg_min_grad_norm,
        max_grad_norm=cfg.reg_max_grad_norm,
        min_nn_count=cfg.track_mask_query_nn_k,
        max_iteration=cfg.reg_iter_n, term_thre_deg=cfg.reg_term_thre_deg,
        term_thre_m=cfg.reg_term_thre_m, encode_vecs=encode_vecs,
        weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        max_sdf_std=max_sdf_std, stagnation_iter=cfg.stagnation_iter,
    ))
    S = cfg.max_source_points

    @jax.jit
    def f_source(points, train_mask):
        src_mask = voxel_down_sample_mask(
            points, train_mask, cfg.source_vox_down_m, cfg.map_hash_size)
        n_src = jnp.sum(src_mask.astype(jnp.int32))
        (src_idx,) = jnp.nonzero(src_mask, size=S, fill_value=0)
        return points[src_idx], jnp.arange(S) < n_src

    src_pts, smask = f_source(points, train_mask)
    rot, pos, rest, P = st.rot, st.pos, st.rest, st.P

    t_track = timeit(
        upd, st.map_state, st.mlp, src_pts, smask, rot, pos, rest, P,
        st.travel_dist, fid, window)

    # --------------------------------------------------------- prep pieces
    origin = pose[:3, 3]
    world_pts = transform_points(points, pose)
    key = jax.random.PRNGKey(0)

    f_lm_append = jax.jit(partial(
        lm.update_local_map, resolution=cfg.local_voxel_size_m,
        map_size=cfg.local_map_size, crop_now=False))
    f_lm_crop = jax.jit(partial(
        lm.update_local_map, resolution=cfg.local_voxel_size_m,
        map_size=cfg.local_map_size, crop_now=True))
    t_lm_append = timeit(f_lm_append, st.local_map, origin, world_pts,
                         train_mask)
    t_lm_crop = timeit(f_lm_crop, st.local_map, origin, world_pts,
                       train_mask)

    f_sampler = jax.jit(partial(
        sample_rays,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_front_n=cfg.free_front_n, free_behind_n=cfg.free_behind_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        max_range=cfg.max_range, dist_weight_on=cfg.dist_weight_on,
        dist_weight_scale=cfg.dist_weight_scale))
    t_sampler = timeit(f_sampler, key, points, train_mask, pose,
                       st.local_map, cfg.local_voxel_size_m)
    batch = f_sampler(key, points, train_mask, pose, st.local_map,
                      cfg.local_voxel_size_m)
    coords_global = transform_points(batch.coords, pose)

    f_insert = jax.jit(partial(nm.insert_points, resolution=cfg.voxel_size_m,
                               diff_travel_dist_local=window))
    upd_sel = batch.mask & (
        jnp.abs(batch.sdf_label)
        < cfg.surface_sample_range_m * cfg.map_surface_ratio)
    t_insert = timeit(
        lambda: f_insert(
            jax.tree.map(jnp.copy, st.map_state), coords_global, upd_sel,
            travel_dist=st.travel_dist, cur_ts=fid))

    one_cell_mvd2 = 3.0 * (2.0 * cfg.voxel_size_m) ** 2
    f_novel = jax.jit(partial(nm.query_certainty_max,
                              resolution=cfg.voxel_size_m,
                              max_valid_dist2=one_cell_mvd2))
    t_novelty = timeit(f_novel, st.map_state, coords_global)

    is_new = jnp.zeros_like(batch.mask)
    f_append = jax.jit(partial(pl.append_samples, frame_id=0))
    t_pool_append = timeit(
        lambda: f_append(
            jax.tree.map(jnp.copy, st.pool), coords_global,
            batch.sdf_label, batch.weight, batch.mask, is_new=is_new,
            key=key))
    f_filter = jax.jit(partial(pl.filter_pool,
                               window_radius=cfg.window_radius))
    t_pool_filter = timeit(
        lambda: f_filter(jax.tree.map(jnp.copy, st.pool), origin))

    # ------------------------------------------------------------ mapping
    mapping_fn = mp.make_mapping_fn(
        feature_dim=cfg.feature_dim, knn_k=cfg.query_nn_k, nb_offs=nb_offs,
        resolution=cfg.voxel_size_m, max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale, sigma=cfg.sdf_scale, bs=cfg.bs,
        bs_new=cfg.bs_new_sample,
        gradient_decimation=cfg.gradient_decimation,
        num_grad_eps=cfg.num_grad_eps, weight_e=cfg.weight_e,
        loss_weight_on=cfg.loss_weight_on, lr=cfg.lr,
        adam_eps=cfg.adam_eps, encode_vecs=encode_vecs,
        weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        resample_every=cfg.map_resample_every)
    iters = jnp.asarray(cfg.iters, jnp.int32)
    t_mapping = timeit(
        lambda: mapping_fn(
            jax.tree.map(jnp.copy, st.map_state), st.mlp, st.color_mlp,
            st.sem_mlp, st.pool, st.travel_dist, fid, window, key, iters,
            jnp.asarray(1.0, jnp.float32)))

    t_pre = timeit(f_preproc, points, pmask)
    t_src = timeit(f_source, points, train_mask)

    rows = [
        ("preprocess (crop+voxel masks)", t_pre),
        ("source select", t_src),
        ("tracking cached update", t_track),
        ("local map append", t_lm_append),
        ("local map crop+rehash", t_lm_crop),
        ("sampler (+region labels)", t_sampler),
        ("neural map insert", t_insert),
        ("novelty certainty probe", t_novelty),
        ("pool append", t_pool_append),
        ("pool filter", t_pool_filter),
        ("mapping loop (10 iters)", t_mapping),
    ]
    print(f"# device: {jax.devices()[0]}")
    print(f"# map points: {int(st.map_state.count)}, "
          f"local map: {int(st.local_map.count)}, "
          f"pool: {int(st.pool.size)}")
    total = 0.0
    for name, t in rows:
        print(f"{name:34s} {t:8.2f} ms")
        total += t
    # steady frame = everything except the lazy crop (runs 1/10 frames)
    steady = total - t_lm_crop - t_pool_filter
    print(f"{'SUM (all pieces)':34s} {total:8.2f} ms")
    print(f"{'steady-frame estimate':34s} {steady:8.2f} ms")


if __name__ == "__main__":
    main()
