#!/usr/bin/env python3
"""Measure TRUE per-frame device compute by running the SLAM executables
back-to-back with ZERO device->host reads (axon's pipelined fast path
stays engaged; wall-clock over N frames / N = real throughput).

Then deliberately poison the fast path with one D2H read and re-measure,
to quantify the sync-mode overhead the r1 bench was paying.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.config import Config
from clid_slam_tpu.pipeline.synthetic import generate_sequence
from clid_slam_tpu.pipeline.slam import SlamSystem


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)

    n_frames = 24
    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.search_alpha = 0.5
    cfg.local_voxel_size_m = 0.2
    cfg.surface_sample_range_m = 0.25
    cfg.surface_sample_n = 4
    cfg.free_front_n = 2
    cfg.free_behind_n = 1
    cfg.vox_down_m = 0.1
    cfg.source_vox_down_m = 0.6
    cfg.min_range = 0.5
    cfg.max_range = 60.0
    cfg.bs = 16384
    cfg.bs_new_sample = 1000
    cfg.iters = 10
    cfg.init_iter_ratio = 40
    cfg.reg_iter_n = 50
    cfg.freeze_after_frame = 15
    cfg.loss_weight_on = True
    cfg.adaptive_iters = False  # no host reads
    cfg.map_capacity = 1 << 20
    cfg.map_hash_size = 1 << 22
    cfg.local_map_capacity = 1 << 19
    cfg.local_map_hash_size = 1 << 21
    cfg.max_scan_points = 1 << 15
    cfg.max_source_points = 1 << 13
    cfg.pool_capacity = 1 << 21
    cfg.pool_filter_freq = 10
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    cfg.diff_travel_dist_local = 1e9

    seq = generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )
    system = SlamSystem(cfg, total_frames=n_frames + 8)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    # ---- phase 1: bootstrap 3 frames the normal way (compiles everything,
    # and the host reads poison the fast path — expected)
    for i in range(3):
        t0 = time.perf_counter()
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        print(f"# bootstrap frame {i}: {(time.perf_counter()-t0)*1e3:.1f} ms",
              flush=True)

    # ---- phase 2: measure each executable amortized over repeats with no
    # further reads (session already poisoned => these include ~24ms sync
    # dispatch each; subtracting the trivial-dispatch cost gives compute)
    d = system.dataset
    ms = system.map_state
    window = cfg.diff_travel_dist_local
    x = system.tracker.x
    rest0 = jnp.asarray(
        np.concatenate([x.vel, x.bg, x.ba, x.grav]), jnp.float32
    )
    rot0 = jnp.asarray(x.rot, jnp.float32)
    pos0 = jnp.asarray(x.pos, jnp.float32)
    P0 = jnp.asarray(system.tracker.P, jnp.float32)

    @jax.jit
    def f_trivial(x):
        return x + 1.0

    xs = jnp.zeros((8, 128))
    for _ in range(3):
        r = f_trivial(xs)
    jax.block_until_ready(r)
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        r = f_trivial(xs)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    disp = float(np.median(ts) * 1e3)
    print(f"dispatch overhead (poisoned): {disp:.2f} ms", flush=True)

    def bench_call(tag, fn, n=10):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag}: {dt:.2f} ms/call (incl {disp:.1f} dispatch)", flush=True)
        return r

    # tracking: full iterated update (non-donated args; reusable)
    bench_call(
        "update_iterated (<=50 it)",
        lambda: system.update_iterated_dev(
            ms, system.mlp, d.cur_source_points, d.cur_source_mask,
            rot0, pos0, rest0, P0, system.travel_dist_dev, 3, window,
        ),
    )

    # single h_reduce
    bench_call(
        "h_reduce x1",
        lambda: system.h_reduce_core(
            ms, system.mlp, d.cur_source_points, d.cur_source_mask,
            rot0, pos0, system.travel_dist_dev, 3, window,
        ),
    )

    # mapping with iters as dynamic arg: n iters at bs (map_state donated —
    # chain it through like the real loop)
    for iters in (1, 10):
        key = jax.random.PRNGKey(0)
        st = system.map_state
        out = system.mapping_fn(
            st, system.mlp, system.color_mlp, system.sem_mlp, system.pool,
            system.travel_dist_dev, 3, window, key, iters, 1.0,
        )
        st = out[0]
        jax.block_until_ready(out[4])
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            out = system.mapping_fn(
                st, system.mlp, system.color_mlp, system.sem_mlp,
                system.pool, system.travel_dist_dev, 3, window, key,
                iters, 1.0,
            )
            st = out[0]
        jax.block_until_ready(out[4])
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"mapping x{iters} (bs={cfg.bs}): {dt:.2f} ms/call", flush=True)
        system.map_state = st
        ms = system.map_state

    # prep (donates map/local/pool — chain like the real loop)
    prep = system._prep_fns.get(False)
    if prep is None:
        system._map_prep(2, d.cur_pose_ref)
        prep = system._prep_fns.get(False)
    key = jax.random.PRNGKey(1)
    pose_j = jnp.asarray(d.cur_pose_ref, jnp.float32)

    r = None
    n = 10
    res = prep(
        system.map_state, system.local_map, system.pool, key,
        d.cur_points, d.cur_mask, pose_j, system.travel_dist_dev, 3,
        window, None, None,
    )
    jax.block_until_ready(res.map_state.count)
    t0 = time.perf_counter()
    for _ in range(n):
        res = prep(
            res.map_state, res.local_map, res.pool, key,
            d.cur_points, d.cur_mask, pose_j, system.travel_dist_dev, 3,
            window, None, None,
        )
    jax.block_until_ready(res.map_state.count)
    print(f"prep: {(time.perf_counter()-t0)/n*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
