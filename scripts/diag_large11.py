#!/usr/bin/env python3
"""r5 label-quality diag: feed the CLID sampler GROUND-TRUTH poses + a
gt-pose local map on the large-bench world, then compare every produced
SDF label against the analytic true signed distance (floor region).
Zero pose error => isolates label bias physics from SLAM feedback.

Buckets label bias by range for: surface samples, free-front, free-behind
(with and without the incidence correction).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.utils.transforms import transform_points

N_FRAMES = 46
cfg = bench.build_config(large=True)
seq = bench.make_sequence(True, N_FRAMES)
world = None  # recover from generator params
from clid_slam_tpu.pipeline.synthetic import large_world
wrng = np.random.default_rng(11)
world = large_world(wrng, room_radius=50.0)

local = lm.init_local_map(cfg.local_map_capacity, cfg.local_map_hash_size)
for i in range(N_FRAMES):
    pts = seq.scans[i][:, :3]
    T = seq.poses[i]
    wpts = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    m = np.linalg.norm(pts, axis=1) < cfg.max_range
    local = lm.update_local_map(
        local, jnp.asarray(T[:3, 3], jnp.float32), jnp.asarray(wpts),
        jnp.asarray(m), cfg.local_voxel_size_m, cfg.local_map_size,
        crop_now=(i % 10 == 9),
    )
print(f"# local map points: {int(local.count)}", file=sys.stderr)

fi = N_FRAMES - 1
T = seq.poses[fi].astype(np.float32)
pts = seq.scans[fi][:, :3].astype(np.float32)
keep = np.linalg.norm(pts, axis=1) < cfg.max_range
pts = pts[keep][: 1 << 15]
pad = np.zeros((1 << 15, 3), np.float32)
pad[: len(pts)] = pts
mask = np.zeros(1 << 15, bool)
mask[: len(pts)] = True

def run_sampler(inc_on):
    return sample_rays(
        jax.random.PRNGKey(0), jnp.asarray(pad), jnp.asarray(mask),
        jnp.asarray(T), local, cfg.local_voxel_size_m,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_front_n=cfg.free_front_n,
        free_behind_n=cfg.free_behind_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        max_range=cfg.max_range,
        dist_weight_on=cfg.dist_weight_on,
        dist_weight_scale=cfg.dist_weight_scale,
        incidence_label_on=inc_on,
        incidence_min_factor=cfg.incidence_min_factor,
    )

def true_sdf_floor(world_pts):
    """Signed distance restricted to clearly-floor-region points: return
    (sdf, ok) where ok = the floor is the nearest structure by a margin."""
    z = world_pts[:, 2]
    rho = np.linalg.norm(world_pts[:, :2], axis=1)
    d_floor = z - world.floor_z  # signed: + above
    d_ceil = world.ceil_z - z
    d_wall = world.room_radius - rho
    # distance to nearest pillar axis minus radius
    d_pil = np.full(len(world_pts), 1e9)
    for cx, cy, r in world.pillars:
        d = np.sqrt((world_pts[:, 0] - cx) ** 2 + (world_pts[:, 1] - cy) ** 2) - r
        d_pil = np.minimum(d_pil, np.abs(d))
    d_box = np.full(len(world_pts), 1e9)
    for cx, cy, hx, hy, z0, z1 in world.boxes:
        dx = np.maximum(np.abs(world_pts[:, 0] - cx) - hx, 0)
        dy = np.maximum(np.abs(world_pts[:, 1] - cy) - hy, 0)
        d_box = np.minimum(d_box, np.hypot(dx, dy))
    others = np.minimum.reduce([d_ceil, d_wall, d_pil, d_box])
    ok = (np.abs(d_floor) < 0.5) & (others > 1.0)
    return d_floor, ok

n = pad.shape[0]
s_total = 1 + cfg.surface_sample_n + cfg.free_front_n + cfg.free_behind_n
parts = (["end"] + ["surf"] * cfg.surface_sample_n
         + ["front"] * cfg.free_front_n + ["behind"] * cfg.free_behind_n)
rng_sensor = np.linalg.norm(pad, axis=1)

for inc_on in (False, True):
    b = run_sampler(inc_on)
    coords = np.asarray(b.coords).reshape(s_total, n, 3)
    labels = np.asarray(b.sdf_label).reshape(s_total, n)
    bmask = np.asarray(b.mask).reshape(s_total, n)
    print(f"== incidence_label_on={inc_on}")
    for pname in ("surf", "front", "behind"):
        rows = [i for i, p in enumerate(parts) if p == pname]
        c = coords[rows].reshape(-1, 3)
        l = labels[rows].reshape(-1)
        mk = bmask[rows].reshape(-1)
        w = transform_points(jnp.asarray(c), jnp.asarray(T))
        w = np.asarray(w)
        tsdf, ok = true_sdf_floor(w)
        ok &= mk
        rr = np.tile(rng_sensor[None, :], (len(rows), 1)).reshape(-1)
        for lo, hi in ((3, 8), (8, 14), (14, 20), (20, 30)):
            sel = ok & (rr >= lo) & (rr < hi)
            if sel.sum() < 50:
                continue
            bias = l[sel] - tsdf[sel]
            print(f"  {pname:6s} r[{lo:2d},{hi:2d}): n={sel.sum():6d} "
                  f"label-true bias mean={bias.mean():+.4f} "
                  f"med={np.median(bias):+.4f} p10={np.quantile(bias,0.1):+.3f} "
                  f"p90={np.quantile(bias,0.9):+.3f}")
