import numpy as np
import jax.numpy as jnp

from clid_slam_tpu.models import local_map as lm

RES = 0.2
CAP = 1 << 14
HASH = 1 << 16


def update(state, pts, sensor=(0, 0, 0), map_size=100.0):
    n = pts.shape[0]
    return lm.update_local_map(
        state,
        jnp.asarray(sensor, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.ones((n,), bool),
        RES,
        map_size,
    )


def grid_plane(n=40, z=0.0, lo=-2.0, hi=2.0):
    xs = np.linspace(lo, hi, n)
    g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    return np.concatenate([g, np.full((len(g), 1), z)], -1).astype(np.float32)


def test_insert_and_crop():
    pts = grid_plane()
    st = update(lm.init_local_map(CAP, HASH), pts)
    c0 = int(st.count)
    assert c0 > 0
    # crop: move sensor far away with small map size -> everything dropped
    st2 = update(st, np.zeros((1, 3), np.float32) + 50.0, sensor=(50, 50, 50), map_size=5.0)
    assert int(st2.count) <= 1


def test_region_specific_plane_label():
    """Points above a dense plane get point-to-plane distance."""
    pts = grid_plane(n=60)  # spacing ~0.068 < RES
    st = update(lm.init_local_map(CAP, HASH), pts)
    q = np.array(
        [[0.1, 0.2, 0.15], [-0.5, 0.3, 0.05], [1.0, -1.0, 0.18]], np.float32
    )
    sdf_abs, surf = lm.region_specific_sdf(st, jnp.asarray(q), RES)
    sdf_abs, surf = np.asarray(sdf_abs), np.asarray(surf)
    assert surf.all()
    np.testing.assert_allclose(sdf_abs, np.abs(q[:, 2]), atol=0.03)
    # a query two voxel layers above the plane leaves the 7-cell probe's
    # reach for 4-NN: falls back to 1-NN distance (> plane distance)
    qfar = np.array([[1.0, -1.0, 0.35]], np.float32)
    far_abs, far_surf = lm.region_specific_sdf(st, jnp.asarray(qfar), RES)
    assert np.asarray(far_surf)[0]
    assert float(far_abs[0]) >= 0.35


def test_region_specific_far_query_invalid():
    pts = grid_plane(n=30)
    st = update(lm.init_local_map(CAP, HASH), pts)
    q = np.array([[10.0, 10.0, 5.0]], np.float32)
    sdf_abs, surf = lm.region_specific_sdf(st, jnp.asarray(q), RES)
    assert not np.asarray(surf)[0]
    np.testing.assert_allclose(
        np.asarray(sdf_abs)[0], lm.local_max_valid_range(RES), atol=1e-5
    )


def test_region_specific_sparse_falls_back_to_nn(rng):
    """Isolated single point: no plane, label = 1-NN distance."""
    pts = np.array([[0.0, 0.0, 0.0]], np.float32)
    st = update(lm.init_local_map(CAP, HASH), pts)
    q = np.array([[0.15, 0.0, 0.0]], np.float32)
    sdf_abs, surf = lm.region_specific_sdf(st, jnp.asarray(q), RES)
    assert np.asarray(surf)[0]
    np.testing.assert_allclose(np.asarray(sdf_abs)[0], 0.15, atol=1e-5)
