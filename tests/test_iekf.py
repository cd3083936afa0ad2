"""IESEKF tracker tests: IMU propagation sanity + pose recovery against a
trained synthetic SDF map (the M3 slice)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.odometry import iekf
from clid_slam_tpu.ops.voxel import neighbor_offsets

RES = 0.3
F = 8
KNN = 6


def test_predict_static_gravity_cancel():
    """Static IMU: accelerometer reads -g in body frame; state must stay put."""
    f = iekf.IEKF(iekf.IEKFConfig())
    for _ in range(100):
        f.predict(np.array([0.0, 0.0, iekf.G_M_S2]), np.zeros(3), 0.01)
    assert np.linalg.norm(f.x.pos) < 1e-9
    assert np.linalg.norm(f.x.vel) < 1e-9
    np.testing.assert_allclose(f.x.rot, np.eye(3), atol=1e-12)
    # covariance grows
    assert np.trace(f.P) > np.trace(np.eye(18) * 0.1)


def test_predict_constant_acceleration():
    """1 m/s² forward for 1s -> v = 1 m/s, p ≈ 0.5 m (Euler forward)."""
    f = iekf.IEKF(iekf.IEKFConfig())
    dt, n = 0.001, 1000
    for _ in range(n):
        f.predict(np.array([1.0, 0.0, iekf.G_M_S2]), np.zeros(3), dt)
    np.testing.assert_allclose(f.x.vel, [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(f.x.pos, [0.5, 0, 0], atol=2e-3)


def test_predict_rotation():
    """Constant yaw rate π/2 rad/s for 1s -> 90° yaw."""
    f = iekf.IEKF(iekf.IEKFConfig())
    dt, n = 0.001, 1000
    w = np.array([0.0, 0.0, np.pi / 2])
    for _ in range(n):
        f.predict(np.array([0.0, 0.0, iekf.G_M_S2]), w, dt)
    expected = iekf._so3_exp(w)  # total rotation π/2 about z
    # gravity no longer cancels after rotation (acc stays body-z) — only
    # check rotation here
    np.testing.assert_allclose(f.x.rot, expected, atol=1e-3)


@pytest.fixture(scope="module")
def trained_scene():
    """Train a small map of a cylinder wall room; reused across tests."""
    rng = np.random.default_rng(7)
    n = 1024
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    pts = np.stack([4.0 * np.cos(ang), 4.0 * np.sin(ang), z], -1).astype(
        np.float32
    )
    mask = jnp.ones((n,), bool)
    pose = jnp.eye(4)

    lmap = lm.init_local_map(1 << 13, 1 << 15)
    lmap = lm.update_local_map(lmap, jnp.zeros(3), jnp.asarray(pts), mask, 0.1, 100.0)
    batch = sample_rays(
        jax.random.PRNGKey(0),
        jnp.asarray(pts),
        mask,
        pose,
        lmap,
        0.1,
        surface_sample_range_m=0.25,
        surface_sample_n=3,
        free_front_n=2,
        free_behind_n=1,
        free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0,
        max_range=60.0,
    )
    nmap = nm.init_map(1 << 13, 1 << 15, F)
    travel = jnp.zeros((8,), jnp.float32)
    nmap, _ = nm.insert_points(
        nmap, batch.coords, batch.mask & (jnp.abs(batch.sdf_label) < 0.125), RES,
        travel, 0, 1e9,
    )
    pool = pl.init_pool(1 << 15, 1 << 15)
    pool = pl.append_samples(
        pool, batch.coords, batch.sdf_label, batch.weight, batch.mask, 0,
        jnp.zeros_like(batch.mask),
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    sdf_scale = 0.55 * 0.1
    mapping = mp.make_mapping_fn(
        feature_dim=F, knn_k=KNN, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=sdf_scale, sigma=sdf_scale,
        bs=2048, bs_new=0, gradient_decimation=10, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
    )
    color_mlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
    sem_mlp = dec.init_mlp(jax.random.PRNGKey(4), F + 3, 32, 1)
    nmap, mlp, _, _, _ = mapping(
        nmap, mlp, color_mlp, sem_mlp, pool, travel, 0, 1e9,
        jax.random.PRNGKey(2), 400, 1.0,
    )
    return pts, nmap, mlp, travel


def test_update_recovers_perturbed_pose(trained_scene):
    pts, nmap, mlp, travel = trained_scene
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    h_reduce_core = iekf.make_h_reduce_fn(
        knn_k=KNN, nb_offs=nb, resolution=RES, max_valid_dist2=mvd2,
        sdf_scale=0.55 * 0.1, min_grad_norm=0.5, max_grad_norm=1.5,
        min_nn_count=KNN,
    )

    def h_reduce(points_imu, mask, R, t, *args):
        return h_reduce_core(nmap, mlp, points_imu, mask, R, t, travel, 0, 1e9)

    # true pose = identity; start the filter perturbed
    f = iekf.IEKF(iekf.IEKFConfig(max_iteration=50))
    dx0 = np.zeros(18)
    dx0[0:3] = np.array([0.0, 0.0, np.deg2rad(2.0)])  # 2° yaw
    dx0[3:6] = np.array([0.15, -0.1, 0.05])
    f.x = f.x.boxplus(dx0)

    src = jnp.asarray(pts[::2])  # source cloud in sensor frame (true pose=I)
    mask = jnp.ones((src.shape[0],), bool)
    pose, ok = f.update_iterated(h_reduce, src, mask)
    assert ok
    # recovered pose close to identity
    t_err = np.linalg.norm(pose[:3, 3])
    r_err = np.rad2deg(
        np.linalg.norm(iekf._so3_log(np.asarray(pose[:3, :3], np.float64)))
    )
    assert t_err < 0.05, t_err
    assert r_err < 0.8, r_err


def test_update_flags_invalid_without_map(trained_scene):
    """Querying far outside the map: no valid points -> valid_flag False."""
    pts, nmap, mlp, travel = trained_scene
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    h_core = iekf.make_h_reduce_fn(
        knn_k=KNN, nb_offs=nb, resolution=RES, max_valid_dist2=mvd2,
        sdf_scale=0.55 * 0.1, min_grad_norm=0.5, max_grad_norm=1.5,
        min_nn_count=KNN,
    )

    def h_reduce(points_imu, mask, R, t, *args):
        return h_core(nmap, mlp, points_imu, mask, R, t, travel, 0, 1e9)

    src = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (128, 3)).astype(np.float32)
    )
    S6, b6, n_valid, n_total = h_reduce(
        src,
        jnp.ones((128,), bool),
        jnp.eye(3, dtype=jnp.float32),
        jnp.asarray([500.0, 0.0, 0.0], jnp.float32),
    )
    # far outside the map: zero valid points, zero information
    assert int(n_valid) == 0
    assert float(jnp.abs(S6).sum()) == 0.0
    assert float(jnp.abs(b6).sum()) == 0.0
    # and the filter then reports zero-information convergence (pose kept),
    # mirroring the reference's behavior when H is empty
    f = iekf.IEKF(iekf.IEKFConfig(max_iteration=3))
    f.x.pos = np.array([500.0, 0.0, 0.0])
    pose, _ = f.update_iterated(h_reduce, src, jnp.ones((128,), bool))
    np.testing.assert_allclose(pose[:3, 3], [500.0, 0, 0], atol=1e-6)


def test_device_scan_propagation_matches_host_f64():
    """The r3 associative-scan device propagation must track the host f64
    sequential filter at realistic IMU magnitudes (200 Hz, <=1 rad/s,
    <=2 m/s^2) to f32 rounding levels."""
    rng = np.random.default_rng(7)
    n, K = 20, 64
    rows = np.zeros((K, 7), np.float32)
    rows[:n, 0] = 0.005
    rows[:n, 1:4] = (rng.normal(size=(n, 3)) * 1.0 + [0, 0, iekf.G_M_S2])
    rows[:n, 4:7] = rng.normal(size=(n, 3)) * 0.5

    f = iekf.IEKF(iekf.IEKFConfig())
    f.x.vel = np.array([1.0, -0.5, 0.2])
    for i in range(n):
        f.predict(rows[i, 1:4], rows[i, 4:7], float(rows[i, 0]))

    Q = np.zeros((12, 12), np.float32)
    c = iekf.IEKFConfig()
    Q[0:3, 0:3] = c.measurement_noise_covariance * np.eye(3)
    Q[3:6, 3:6] = c.measurement_noise_covariance * np.eye(3)
    Q[6:9, 6:9] = c.bias_noise_covariance * np.eye(3)
    Q[9:12, 9:12] = c.bias_noise_covariance * np.eye(3)
    P0 = np.eye(18, dtype=np.float32)
    P0[9:12, 9:12] *= 1e-4
    P0[12:15, 12:15] *= 1e-3
    P0[15:18, 15:18] *= 1e-4
    rot, pos, vel, bg, ba, grav, P = iekf.device_predict_imu(
        jnp.eye(3), jnp.zeros(3), jnp.asarray([1.0, -0.5, 0.2]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray([0.0, 0.0, -iekf.G_M_S2]),
        jnp.asarray(P0), jnp.asarray(Q), jnp.asarray(rows),
        jnp.asarray(n, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(rot), f.x.rot, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pos), f.x.pos, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vel), f.x.vel, atol=1e-4)
    np.testing.assert_allclose(np.asarray(P), f.P, atol=1e-4)
