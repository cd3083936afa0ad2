"""Sliding-window BA: pose corrections recovered against a trained map."""

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.mapping import bundle_adjustment as ba
from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets

RES = 0.3
F = 8


def test_ba_recovers_pose_offset(rng):
    # trained cylinder map (true pose = I)
    n = 1024
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    pts = np.stack([4 * np.cos(ang), 4 * np.sin(ang), z], -1).astype(np.float32)
    mask = jnp.ones((n,), bool)
    pose = jnp.eye(4)
    lmap = lm.init_local_map(1 << 13, 1 << 15)
    lmap = lm.update_local_map(lmap, jnp.zeros(3), jnp.asarray(pts), mask, 0.1, 100.0)
    batch = sample_rays(
        jax.random.PRNGKey(0), jnp.asarray(pts), mask, pose, lmap, 0.1,
        surface_sample_range_m=0.25, surface_sample_n=3, free_front_n=2,
        free_behind_n=1, free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0, max_range=60.0,
    )
    nmap = nm.init_map(1 << 13, 1 << 15, F)
    travel = jnp.zeros((8,), jnp.float32)
    nmap, _ = nm.insert_points(
        nmap, batch.coords, batch.mask & (jnp.abs(batch.sdf_label) < 0.125),
        RES, travel, 0, 1e9,
    )
    pool = pl.init_pool(1 << 15, 1 << 15)
    pool = pl.append_samples(
        pool, batch.coords, batch.sdf_label, batch.weight, batch.mask, 0,
        jnp.zeros_like(batch.mask),
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    mapping = mp.make_mapping_fn(
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, sigma=0.055, bs=2048,
        bs_new=0, gradient_decimation=10, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
    )
    cm = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
    sm = dec.init_mlp(jax.random.PRNGKey(4), F + 3, 32, 1)
    nmap, mlp, _, _, _ = mapping(
        nmap, mlp, cm, sm, pool, travel, 0, 1e9, jax.random.PRNGKey(2),
        300, 1.0,
    )

    # Window of 2 poses, both perturbed from identity. The pool's world
    # coords must be CONSISTENT with the window poses (BA recomputes
    # sensor-frame coords as T0⁻¹·world): odometry with pose=offset would
    # have produced world coords offset·sensor_pts.
    offset = np.eye(4)
    offset[:3, 3] = [0.06, -0.04, 0.02]
    poses0 = jnp.asarray(
        np.stack([offset, offset]), jnp.float32
    )  # frames 0..1 (all pool ts are 0)
    drifted = pool._replace(
        data=pool.data.at[:, 0:3].add(jnp.asarray(offset[:3, 3], jnp.float32))
    )

    ba_fn = ba.make_ba_fn(
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, window_size=2, ba_bs=4096,
        lr_pose=2e-3, lr_map=0.0, adam_eps=1e-15,
    )
    nmap2, new_poses, loss = ba_fn(
        nmap, mlp, drifted, poses0, 0, travel, 0, 1e9,
        jax.random.PRNGKey(5), 150
    )
    new_poses = np.asarray(new_poses)
    # the optimized pose for frame 0 must move toward identity
    err_before = np.linalg.norm(offset[:3, 3])
    err_after = np.linalg.norm(new_poses[0][:3, 3])
    assert np.isfinite(float(loss))
    assert err_after < err_before * 0.6, (err_before, err_after)


def test_ba_reduces_window_ate(rng):
    """VERDICT r3 weak #7: BA must measurably reduce the WINDOW ATE on a
    drifted multi-frame trajectory vs skipping BA (utils/mapper.py:866-965
    is the reference behavior being matched)."""
    n = 1024
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    pts = np.stack(
        [4 * np.cos(ang), 4 * np.sin(ang), z], -1
    ).astype(np.float32)
    mask = jnp.ones((n,), bool)
    lmap = lm.init_local_map(1 << 13, 1 << 15)
    lmap = lm.update_local_map(
        lmap, jnp.zeros(3), jnp.asarray(pts), mask, 0.1, 100.0
    )
    batch = sample_rays(
        jax.random.PRNGKey(0), jnp.asarray(pts), mask, jnp.eye(4), lmap,
        0.1, surface_sample_range_m=0.25, surface_sample_n=3,
        free_front_n=2, free_behind_n=1, free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0, max_range=60.0,
    )
    nmap = nm.init_map(1 << 13, 1 << 15, F)
    travel = jnp.zeros((8,), jnp.float32)
    nmap, _ = nm.insert_points(
        nmap, batch.coords,
        batch.mask & (jnp.abs(batch.sdf_label) < 0.125),
        RES, travel, 0, 1e9,
    )
    pool0 = pl.init_pool(1 << 15, 1 << 15)
    pool0 = pl.append_samples(
        pool0, batch.coords, batch.sdf_label, batch.weight, batch.mask,
        0, jnp.zeros_like(batch.mask),
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    mapping = mp.make_mapping_fn(
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, sigma=0.055, bs=2048,
        bs_new=0, gradient_decimation=10, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
    )
    cm = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
    sm = dec.init_mlp(jax.random.PRNGKey(4), F + 3, 32, 1)
    nmap, mlp, _, _, _ = mapping(
        nmap, mlp, cm, sm, pool0, travel, 0, 1e9, jax.random.PRNGKey(2),
        300, 1.0,
    )

    # 4-frame window with GROWING drift (gt poses = identity: a static
    # platform re-observing the same scene; est poses drift away)
    W = 4
    drift = np.zeros((W, 3))
    drift[1] = [0.02, -0.01, 0.01]
    drift[2] = [0.05, -0.03, 0.02]
    drift[3] = [0.08, -0.05, 0.03]
    poses_est = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
    poses_est[:, :3, 3] = drift

    # each frame contributes endpoint samples at its DRIFTED world coords
    pool = pl.init_pool(1 << 15, 1 << 15)
    sel = np.asarray(batch.mask) & (np.abs(np.asarray(batch.sdf_label)) < 1e-6)
    coords_w = np.asarray(batch.coords)
    for k in range(W):
        pool = pl.append_samples(
            pool,
            jnp.asarray(coords_w + drift[k][None, :]),
            jnp.zeros((len(coords_w),), jnp.float32),
            jnp.ones((len(coords_w),), jnp.float32),
            jnp.asarray(sel),
            k,
            jnp.zeros((len(coords_w),), bool),
        )

    ba_fn = ba.make_ba_fn(
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, window_size=W,
        ba_bs=4096, lr_pose=2e-3, lr_map=0.0, adam_eps=1e-15,
    )
    _, new_poses, loss = ba_fn(
        nmap, mlp, pool, jnp.asarray(poses_est), 0, travel, 0, 1e9,
        jax.random.PRNGKey(5), 200,
    )
    new_poses = np.asarray(new_poses)
    ate_before = float(np.sqrt((drift**2).sum(1).mean()))
    ate_after = float(
        np.sqrt((new_poses[:, :3, 3] ** 2).sum(1).mean())
    )
    assert np.isfinite(float(loss))
    # BA-off keeps ate_before; BA must cut it by >40%
    assert ate_after < ate_before * 0.6, (ate_before, ate_after)
