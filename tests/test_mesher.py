import numpy as np
import jax.numpy as jnp

from clid_slam_tpu.ops.marching import marching_tetrahedra
from clid_slam_tpu.mesher import _weld_mesh
from clid_slam_tpu.utils import metrics


def sphere_grid(dims, origin, res, radius):
    X, Y, Z = dims
    r = [np.arange(d) for d in dims]
    gx, gy, gz = np.meshgrid(*r, indexing="ij")
    pts = np.stack([gx, gy, gz], -1) * res + origin
    sdf = np.linalg.norm(pts, axis=-1) - radius
    return sdf.reshape(-1).astype(np.float32), pts


def test_marching_tets_sphere():
    dims = (24, 24, 24)
    res = 0.1
    origin = np.array([-1.15, -1.15, -1.15], np.float32)
    sdf, _ = sphere_grid(dims, origin, res, 0.8)
    tris, ok = marching_tetrahedra(
        jnp.asarray(sdf),
        jnp.ones_like(jnp.asarray(sdf), bool),
        jnp.asarray(origin),
        res,
        dims,
    )
    tris = np.asarray(tris)[np.asarray(ok)]
    assert len(tris) > 500
    # every triangle vertex lies near the sphere surface
    d = np.abs(np.linalg.norm(tris.reshape(-1, 3), axis=-1) - 0.8)
    assert d.max() < res  # linear interp error bound
    assert d.mean() < 0.02


def test_marching_tets_respects_mask():
    dims = (12, 12, 12)
    res = 0.1
    origin = np.full(3, -0.55, np.float32)
    sdf, _ = sphere_grid(dims, origin, res, 0.4)
    mask = np.zeros(len(sdf), bool)  # all invalid
    tris, ok = marching_tetrahedra(
        jnp.asarray(sdf), jnp.asarray(mask), jnp.asarray(origin), res, dims
    )
    assert not np.asarray(ok).any()


def test_marching_tets_watertight_area():
    """Total surface area of the extracted sphere ≈ 4πr²."""
    dims = (32, 32, 32)
    res = 0.08
    origin = np.full(3, -1.24, np.float32)
    sdf, _ = sphere_grid(dims, origin, res, 0.9)
    tris, ok = marching_tetrahedra(
        jnp.asarray(sdf),
        jnp.ones(len(sdf), bool),
        jnp.asarray(origin),
        res,
        dims,
    )
    tris = np.asarray(tris)[np.asarray(ok)]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    expected = 4 * np.pi * 0.9**2
    assert abs(area - expected) / expected < 0.08


def test_weld_mesh_dedup():
    # two triangles sharing an edge -> 4 unique vertices
    t = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    v, f = _weld_mesh(t, 0.1)
    assert len(v) == 4
    assert len(f) == 2


def test_weld_mesh_cluster_filter():
    # a big quad + one far isolated triangle; filter should drop the latter
    quad = np.array(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    iso = np.array([[[5, 5, 5], [6, 5, 5], [5, 6, 5]]], np.float32)
    v, f = _weld_mesh(np.concatenate([quad, iso]), 0.1, min_cluster_vertices=4)
    assert len(f) == 2  # isolated triangle removed


# ------------------------------------------------------- metrics sanity


def test_ate_zero_for_identical():
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 0, 3] = np.arange(10)
    m = metrics.absolute_error(poses, poses)
    assert m["ate_rmse_m"] < 1e-9


def test_ate_alignment_removes_rigid_offset():
    gt = np.tile(np.eye(4), (20, 1, 1))
    gt[:, 0, 3] = np.arange(20)
    gt[:, 1, 3] = np.sin(np.arange(20))
    # estimated = gt rotated and shifted (identical up to SE(3))
    th = 0.3
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    est = gt.copy()
    est[:, :3, 3] = gt[:, :3, 3] @ R.T + np.array([5.0, -2.0, 1.0])
    est[:, :3, :3] = np.einsum("ij,njk->nik", R, gt[:, :3, :3])
    m = metrics.absolute_error(est, gt, align=True)
    assert m["ate_rmse_m"] < 1e-9


def test_relative_error_translation_drift():
    # straight line 1 m/frame; est drifts 1% in x
    n = 1000
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n)
    est = gt.copy()
    est[:, 0, 3] = np.arange(n) * 1.01
    m = metrics.relative_error(gt, est)
    assert abs(m["drift_t_percent"] - 1.0) < 0.1
