#!/usr/bin/env python3
"""Per-stage DEVICE compute cost, uncontaminated by dispatch overhead.

Each candidate stage runs M times inside ONE jitted lax.fori_loop (with a
data dependency threaded through so XLA can't CSE the iterations); wall
time / M = device cost per invocation. This sidesteps the axon runtime's
degraded-dispatch mode (~27 ms per dispatch once any readback happens),
which poisons naive per-op timing.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/profile_device.py
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.config import Config
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import prep as prp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.ops.voxel import neighbor_offsets
from clid_slam_tpu.odometry import iekf


def bench_loop(make_body, init_carry, M, label, n=3):
    """make_body: (i, carry) -> carry. Times M reps inside one jit."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, M, make_body, carry)

    r = run(init_carry)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = run(init_carry)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / M * 1e3
    print(f"{label}: {per:.3f} ms/call  (total {min(ts)*1e3:.0f} ms / {M})",
          flush=True)
    return per


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    cfg = Config()
    CAP = 1 << 20
    HSIZE = 1 << 22
    F = 8
    res = 0.4
    knn_k = 6
    NB = neighbor_offsets(2, 0.5)  # K=81
    K = NB.shape[0]
    MVD2 = 3.0 * ((2 + 1) * res) ** 2
    td = jnp.zeros((64,), jnp.float32)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-40, 40, (100_000, 3)).astype(np.float32)
    state = nm.init_map(CAP, HSIZE, F)
    state, _ = nm.insert_points(
        state, jnp.asarray(pts), jnp.ones((100_000,), bool), res, td, 0, 1e9,
        downsample=False,
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(0), F + 3, 64, 1, 1)

    BS = 16384
    q0 = jnp.asarray(rng.uniform(-40, 40, (BS, 3)).astype(np.float32))

    # --- probe (hash + mirror gather + dist)
    def probe_body(i, carry):
        q, acc = carry
        qq = q + (i % 3).astype(jnp.float32) * 1e-4
        d2, h, valid, mir = nm.neighborhood_probe(
            state, qq, NB, res, MVD2, td, 0, 1e9, True)
        return (q, acc + jnp.sum(d2[0]))

    bench_loop(probe_body, (q0, 0.0), 30, f"probe [bs={BS},K={K}]")

    # --- top_k 81->6 alone
    d2c = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (BS, K)))

    def topk_body(i, carry):
        d, acc = carry
        dd = d + (i % 3).astype(jnp.float32) * 1e-6
        v, s = jax.lax.top_k(-dd, knn_k)
        return (d, acc + jnp.sum(v[0]))

    bench_loop(topk_body, (d2c, 0.0), 30, f"top_k [bs={BS},{K}->6]")

    # --- full query_feature
    def query_body(i, carry):
        q, acc = carry
        qq = q + (i % 3).astype(jnp.float32) * 1e-4
        r = nm.query_feature(state, qq, NB, res, MVD2, knn_k, td, 0, 1e9, True)
        return (q, acc + jnp.sum(r.feature[0]))

    bench_loop(query_body, (q0, 0.0), 30, f"query_feature [bs={BS}]")

    # --- query + mlp + grad wrt feats (one training fwd+bwd, no adam)
    def train_body(i, carry):
        q, feats, acc = carry
        qq = q + (i % 3).astype(jnp.float32) * 1e-4

        def loss(f):
            st = state._replace(geo_feats=f)
            r = nm.query_feature(st, qq, NB, res, MVD2, knn_k, td, 0, 1e9, True)
            pred = dec.sdf(mlp, r.feature, 0.1)
            return jnp.sum(pred ** 2)

        g = jax.grad(loss)(feats)
        return (q, feats, acc + g[0, 0])

    bench_loop(train_body, (q0, state.geo_feats, 0.0), 10,
               f"query+mlp fwd+bwd(feats) [bs={BS}]")

    # --- full mapping iteration (batch sample + fwd + bwd + adam + scatter)
    cfg.voxel_size_m = res
    pool = pl.init_pool(1 << 21, (1 << 15) * 8, 1)
    n_fill = 1 << 20
    pool = pool._replace(
        coords=pool.coords.at[:n_fill].set(
            jnp.asarray(rng.uniform(-40, 40, (n_fill, 3)).astype(np.float32))),
        sdf=pool.sdf.at[:n_fill].set(0.05),
        weight=pool.weight.at[:n_fill].set(1.0),
        size=jnp.asarray(n_fill, jnp.int32),
    )
    color_mlp = dec.init_mlp(jax.random.PRNGKey(2), F + 3, 64, 1, 1)
    sem_mlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 64, 1, 1)
    mapping1 = mp.make_mapping_fn(
        feature_dim=F, knn_k=knn_k, nb_offs=NB, resolution=res,
        max_valid_dist2=MVD2, sdf_scale=0.1, sigma=0.1, bs=BS, bs_new=1000,
        gradient_decimation=10, num_grad_eps=0.04, weight_e=0.5,
        loss_weight_on=True, lr=0.01, adam_eps=1e-15, as_body=True,
    )

    def mapping_body_n(n_iters):
        def body(i, carry):
            st, mlp_, key, acc = carry
            key, k = jax.random.split(key)
            st2, mlp2, _, _, losses = mapping1(
                st, mlp_, color_mlp, sem_mlp, pool, td, 0, 1e9, k,
                n_iters, 1.0)
            return (st2, mlp2, key, acc + losses[0])
        return body

    k0 = jax.random.PRNGKey(7)
    t1 = bench_loop(mapping_body_n(1), (state, mlp, k0, 0.0), 5,
                    "mapping(1 iter)")
    t10 = bench_loop(mapping_body_n(10), (state, mlp, k0, 0.0), 3,
                     "mapping(10 iters)")
    print(f"  -> per-adam-iter: {(t10 - t1) / 9:.3f} ms; fixed: "
          f"{t1 - (t10 - t1) / 9:.3f} ms", flush=True)

    # --- prep body
    local_map = lm.init_local_map(1 << 19, 1 << 21)
    prep1 = prp.make_prep_fn(
        resolution=res, local_resolution=0.2, local_map_size=100.0,
        window_radius=60.0, surface_sample_range_m=0.25, surface_sample_n=4,
        free_front_n=2, free_behind_n=1, free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0, max_range=60.0, dist_weight_on=True,
        dist_weight_scale=0.8, map_surface_ratio=0.5,
        from_sample_points=True, new_certainty_thre=1.0, novelty_on=True,
        filter_pool_now=False, as_body=True,
    )
    P = 1 << 15
    scan = jnp.asarray(rng.uniform(-40, 40, (P, 3)).astype(np.float32))
    smask = jnp.ones((P,), bool)
    pose = jnp.eye(4, dtype=jnp.float32)

    def prep_body(i, carry):
        st, lmap, pool_, key, acc = carry
        key, k = jax.random.split(key)
        r = prep1(st, lmap, pool_, k, scan, smask, pose, td, 0, 1e9,
                  None, None)
        return (r.map_state, r.local_map, r.pool, key,
                acc + r.new_point_ratio)

    bench_loop(prep_body, (state, local_map, pool, k0, 0.0), 5, "prep(full)")

    # prep sub-pieces: local map update / sampler / insert / novelty / append
    from clid_slam_tpu.mapping.sampler import sample_rays
    from clid_slam_tpu.utils.transforms import transform_points

    def lmu_body(i, carry):
        lmap, acc = carry
        lmap2 = lm.update_local_map(lmap, jnp.zeros(3), scan, smask, 0.2,
                                    100.0)
        return (lmap2, acc + lmap2.count)

    bench_loop(lmu_body, (local_map, 0), 10, "  local_map.update")

    lm_filled = lm.update_local_map(local_map, jnp.zeros(3), scan, smask,
                                    0.2, 100.0)

    def sampler_body(i, carry):
        key, acc = carry
        key, k = jax.random.split(key)
        b = sample_rays(
            k, scan, smask, pose, lm_filled, 0.2,
            surface_sample_range_m=0.25, surface_sample_n=4, free_front_n=2,
            free_behind_n=1, free_sample_begin_ratio=0.3,
            free_sample_end_dist_m=1.0, max_range=60.0, dist_weight_on=True,
            dist_weight_scale=0.8,
        )
        return (key, acc + jnp.sum(b.sdf_label[0]))

    bench_loop(sampler_body, (k0, 0.0), 10, "  sample_rays")

    def insert_body(i, carry):
        st, acc = carry
        st2, r = nm.insert_points.__wrapped__(
            st, scan, smask, res, td, 0, 1e9, downsample=True)
        return (st2, acc + r)

    bench_loop(insert_body, (state, 0.0), 10, "  insert_points")

    SAMP = P * 8

    def novelty_body(i, carry):
        acc, = carry
        c = nm.query_certainty_max(
            state, jnp.tile(scan, (8, 1)), res, 3.0 * (2 * res) ** 2)
        return (acc + jnp.sum(c),)

    bench_loop(novelty_body, (0.0,), 10, f"  novelty [{SAMP}]")

    def append_body(i, carry):
        pool_, key, acc = carry
        key, k = jax.random.split(key)
        p2 = pl.append_samples(
            pool_, jnp.tile(scan, (8, 1)), jnp.zeros(SAMP), jnp.ones(SAMP),
            jnp.ones(SAMP, bool), 0, jnp.zeros(SAMP, bool), key=k)
        return (p2, key, acc + p2.size)

    bench_loop(append_body, (pool, k0, 0), 10, "  pool.append")

    def filter_body(i, carry):
        pool_, acc = carry
        p2 = pl.filter_pool(pool_, jnp.zeros(3), 60.0)
        return (p2, acc + p2.size)

    bench_loop(filter_body, (pool, 0), 10, "  pool.filter")

    # --- cached update (tracking)
    S = 1 << 13
    src = jnp.asarray(rng.uniform(-40, 40, (S, 3)).astype(np.float32))
    sm = jnp.ones((S,), bool)
    for max_it in (1, 12):
        upd = iekf.make_cached_update_fn(
            knn_k=knn_k, n_cand=16, nb_offs=NB, resolution=res,
            max_valid_dist2=MVD2, sdf_scale=0.1, min_grad_norm=0.5,
            max_grad_norm=1.5, min_nn_count=2, max_iteration=max_it,
            term_thre_deg=1e-9, term_thre_m=1e-9,
        )

        def upd_body(i, carry):
            rot, pos, rest, P18, acc = carry
            r, p, rs, Pn, ok, n = upd(
                state, mlp, src, sm, rot, pos, rest, P18, td, 0, 1e9)
            return (rot, pos, rest, P18, acc + p[0])

        bench_loop(
            upd_body,
            (jnp.eye(3), jnp.zeros(3), jnp.zeros(12),
             jnp.eye(18, dtype=jnp.float32), 0.0),
            5, f"cached_update(max_it={max_it}) [S={S}]")

    # --- device IMU predict (64 rows)
    imu_rows = jnp.zeros((64, 7), jnp.float32).at[:, 0].set(0.002)
    Q = jnp.eye(12, dtype=jnp.float32) * 1e-4

    def imu_body(i, carry):
        rot, pos, acc = carry
        r, p, v, bg, ba, g, Pn = iekf.device_predict_imu(
            rot, pos, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            jnp.array([0., 0., -9.81]), jnp.eye(18, dtype=jnp.float32), Q,
            imu_rows, 40)
        return (rot, pos, acc + p[0])

    bench_loop(imu_body, (jnp.eye(3), jnp.zeros(3), 0.0), 10,
               "device_predict_imu [64 rows]")

    # --- voxel downsample masks
    from clid_slam_tpu.ops.voxel import voxel_down_sample_mask

    def vds_body(i, carry):
        acc, = carry
        m = voxel_down_sample_mask.__wrapped__(scan, smask, 0.1, HSIZE)
        return (acc + jnp.sum(m),)

    bench_loop(vds_body, (0,), 20, f"voxel_down_sample [P={P}]")


if __name__ == "__main__":
    main()
