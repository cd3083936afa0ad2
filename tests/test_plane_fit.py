import numpy as np
import jax.numpy as jnp

from clid_slam_tpu.ops import plane_fit as pf


def test_eigvals_match_numpy(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    S = A @ A.transpose(0, 2, 1)  # symmetric PSD
    got = np.sort(np.asarray(pf.sym3x3_eigvals(jnp.asarray(S))), axis=-1)
    want = np.sort(np.linalg.eigvalsh(S.astype(np.float64)), axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_min_eigvec_is_eigenvector(rng):
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    S = A @ A.transpose(0, 2, 1)
    eig = pf.sym3x3_eigvals(jnp.asarray(S))
    v = np.asarray(pf.sym3x3_min_eigvec(jnp.asarray(S), eig))
    lam = np.asarray(eig)[:, 2]
    resid = np.einsum("nij,nj->ni", S, v) - lam[:, None] * v
    # residual small relative to the matrix scale
    scale = np.linalg.norm(S, axis=(1, 2))
    assert (np.linalg.norm(resid, axis=-1) / scale < 1e-2).all()


def test_plane_fit_perfect_plane(rng):
    # 4 points on z = 2 with small in-plane spread
    base = rng.uniform(-1, 1, size=(16, 4, 2)).astype(np.float32)
    pts = np.concatenate([base, np.full((16, 4, 1), 2.0, np.float32)], axis=-1)
    n, c, ok = pf.fit_plane_knn(jnp.asarray(pts))
    n, c, ok = np.asarray(n), np.asarray(c), np.asarray(ok)
    assert ok.all()
    # normal is ±z, constant = ∓2
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(c), 2.0, atol=1e-3)
    # point-to-plane distance of the origin-shifted query = |z_q - 2|
    q = np.array([0.3, -0.4, 2.5], np.float32)
    d = np.abs(pts[:, 0, :] @ np.zeros(3))  # placeholder to keep shape clear
    dist = np.abs(q @ n.T + c)
    np.testing.assert_allclose(dist, 0.5, atol=1e-3)


def test_plane_fit_rejects_noise(rng):
    # isotropic blobs: the eta gate must reject the (vast) majority;
    # 4 random points can occasionally be near-coplanar by chance
    pts = rng.normal(size=(64, 4, 3)).astype(np.float32)
    _, _, ok = pf.fit_plane_knn(jnp.asarray(pts))
    assert np.asarray(ok).mean() < 0.2


def test_plane_fit_rejects_large_residual(rng):
    # near-planar but with one outlier beyond the 0.1 residual gate
    base = rng.uniform(-1, 1, size=(8, 4, 2)).astype(np.float32)
    z = np.zeros((8, 4, 1), np.float32)
    z[:, 3, 0] = 0.5  # outlier — plane fit tilts, residual > 0.1
    pts = np.concatenate([base, z], axis=-1)
    _, _, ok = pf.fit_plane_knn(jnp.asarray(pts))
    assert not np.asarray(ok).all()


def test_plane_fit_matches_svd_reference(rng):
    """Same normals (up to sign) as a numpy SVD fit for well-conditioned
    neighborhoods."""
    base = rng.uniform(-1, 1, size=(32, 4, 2)).astype(np.float32)
    z = (0.02 * rng.normal(size=(32, 4, 1))).astype(np.float32)
    pts = np.concatenate([base, z], axis=-1)
    # rotate each neighborhood by a random rotation
    a = rng.normal(size=(32, 3, 3))
    Q, _ = np.linalg.qr(a)
    pts = np.einsum("nij,nkj->nki", Q, pts).astype(np.float32)

    n_got, c_got, ok = pf.fit_plane_knn(jnp.asarray(pts))
    n_got = np.asarray(n_got)
    for i in range(32):
        if not np.asarray(ok)[i]:
            continue
        cen = pts[i].mean(0)
        _, _, Vh = np.linalg.svd(pts[i] - cen)
        n_ref = Vh[-1]
        dot = abs(np.dot(n_ref, n_got[i]))
        assert dot > 0.999, (i, dot)


def test_fit_plane_masked_matches_gathered():
    """fit_plane_masked over C candidates with a 4-hot mask must equal
    fit_plane_knn on the gathered 4 points."""
    import numpy as np

    rng = np.random.default_rng(3)
    N, C = 64, 7
    pts = rng.normal(size=(N, C, 3)).astype(np.float32)
    # flatten some neighborhoods to near-planes so both branches trigger
    pts[: N // 2, :, 2] *= 0.01
    sel_idx = np.argsort(rng.random((N, C)), axis=1)[:, :4]
    sel = np.zeros((N, C), bool)
    np.put_along_axis(sel, sel_idx, True, axis=1)
    gathered = np.take_along_axis(pts, sel_idx[..., None], axis=1)

    n1, c1, ok1 = pf.fit_plane_knn(jnp.asarray(gathered))
    n2, c2, ok2 = pf.fit_plane_masked(jnp.asarray(pts), jnp.asarray(sel))
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    # normals match up to sign where the fit succeeded
    dots = np.abs(np.sum(np.asarray(n1) * np.asarray(n2), axis=-1))
    assert np.all(dots[np.asarray(ok1)] > 1.0 - 1e-4)
