#!/usr/bin/env python3
"""Ablate prep stages to find where its device time goes.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/profile_prep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.utils.transforms import transform_points


def bench_loop(make_body, init_carry, M, label, n=3):
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
    print(f"{label}: {per:.3f} ms/call", flush=True)
    return per


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    CAP, HSIZE, F, res = 1 << 20, 1 << 22, 8, 0.4
    td = jnp.zeros((64,), jnp.float32)
    P = 1 << 15
    scan = jnp.asarray(rng.uniform(-40, 40, (P, 3)).astype(np.float32))
    smask = jnp.ones((P,), bool)
    pose = jnp.eye(4, dtype=jnp.float32)
    k0 = jax.random.PRNGKey(7)

    state = nm.init_map(CAP, HSIZE, F)
    state, _ = nm.insert_points(
        state, scan, smask, res, td, 0, 1e9, downsample=False)
    local_map = lm.init_local_map(1 << 19, 1 << 21)
    lm_filled = lm.update_local_map(
        local_map, jnp.zeros(3), scan, smask, 0.2, 100.0)

    sampler_kw = dict(
        surface_sample_range_m=0.25, surface_sample_n=4, free_front_n=2,
        free_behind_n=1, free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0, max_range=60.0, dist_weight_on=True,
        dist_weight_scale=0.8,
    )

    # sampler WITHOUT labels (pin_mode does projective labels, no local map)
    def s_pin(i, carry):
        key, acc = carry
        key, k = jax.random.split(key)
        b = sample_rays(k, scan, smask, pose, lm_filled, 0.2,
                        pin_mode=True, **sampler_kw)
        return (key, acc + jnp.sum(b.sdf_label[0]))

    bench_loop(s_pin, (k0, 0.0), 10, "sample_rays pin (no labels)")

    def s_clid(i, carry):
        key, acc = carry
        key, k = jax.random.split(key)
        b = sample_rays(k, scan, smask, pose, lm_filled, 0.2,
                        pin_mode=False, **sampler_kw)
        return (key, acc + jnp.sum(b.sdf_label[0]))

    bench_loop(s_clid, (k0, 0.0), 10, "sample_rays clid (labels)")

    # region-specific label estimation alone at the sampler's query count
    NQ = P * 5  # endpoint + 4 surface samples
    q = jnp.asarray(rng.uniform(-40, 40, (NQ, 3)).astype(np.float32))

    def s_lbl(i, carry):
        acc, = carry
        s, m = lm.region_specific_sdf(lm_filled, q, 0.2)
        return (acc + jnp.sum(s[:4]),)

    bench_loop(s_lbl, (0.0,), 10, f"  region_specific_sdf [{NQ}]")

    # local map update: append-only vs crop
    def lmu_append(i, carry):
        lmap, acc = carry
        lmap2 = lm.update_local_map.__wrapped__(
            lmap, jnp.zeros(3), scan, smask, 0.2, 100.0, crop_now=False)
        return (lmap2, acc + lmap2.count)

    bench_loop(lmu_append, (local_map, 0), 10, "local_map append-only")

    # insert_points internals: downsample off vs on
    def ins_nods(i, carry):
        st, acc = carry
        st2, r = nm.insert_points.__wrapped__(
            st, scan, smask, res, td, 0, 1e9, downsample=False)
        return (st2, acc + r)

    bench_loop(ins_nods, (state, 0.0), 10, "insert_points (no downsample)")

    from clid_slam_tpu.ops.voxel import voxel_down_sample_mask

    def vds(i, carry):
        acc, = carry
        m = voxel_down_sample_mask.__wrapped__(scan, smask, res, HSIZE)
        return (acc + jnp.sum(m),)

    bench_loop(vds, (0,), 10, "  voxel_down_sample alone")

    # pool append with packed vs current
    pool = pl.init_pool(1 << 21, (1 << 15) * 8, 1)
    SAMP = P * 8
    big = jnp.tile(scan, (8, 1))

    def append(i, carry):
        pool_, key, acc = carry
        key, k = jax.random.split(key)
        p2 = pl.append_samples(
            pool_, big, jnp.zeros(SAMP), jnp.ones(SAMP),
            jnp.ones(SAMP, bool), 0, jnp.zeros(SAMP, bool),
            coords_local=big, key=k)
        return (p2, key, acc + p2.size)

    bench_loop(append, (pool, k0, 0), 10, "pool.append (with local coords)")


if __name__ == "__main__":
    main()
