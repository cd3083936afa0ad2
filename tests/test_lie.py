import numpy as np
import jax.numpy as jnp

from clid_slam_tpu.utils import lie


def random_rotmats(rng, n):
    # random rotations via QR of gaussians
    a = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(a)
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q


def test_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)) * 2.0
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    # log(exp(w)) == w for |w| < pi; the vee formula loses precision as
    # theta -> pi (f32), so stay clear of the boundary
    wn = np.linalg.norm(w, axis=-1)
    sel = wn < np.pi - 0.1
    np.testing.assert_allclose(w2[sel], w[sel], atol=1e-3)


def test_exp_small_angle(rng):
    w = rng.normal(size=(8, 3)) * 1e-9
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-7)


def test_exp_orthonormal(rng):
    w = rng.normal(size=(32, 3))
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    RtR = np.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-5)


def test_quat_rotmat_roundtrip(rng):
    R = random_rotmats(rng, 32)
    q = lie.rotmat_to_quat(jnp.asarray(R))
    R2 = np.asarray(lie.quat_to_rotmat(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    R = random_rotmats(rng, 16)
    q = lie.rotmat_to_quat(jnp.asarray(R))
    v = rng.normal(size=(16, 3))
    out_q = np.asarray(lie.quat_rotate(q, jnp.asarray(v)))
    out_m = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(out_q, out_m, atol=1e-5)


def test_quat_multiply_composition(rng):
    Ra = random_rotmats(rng, 8)
    Rb = random_rotmats(rng, 8)
    qa = lie.rotmat_to_quat(jnp.asarray(Ra))
    qb = lie.rotmat_to_quat(jnp.asarray(Rb))
    qab = lie.quat_multiply(qa, qb)
    Rab = np.asarray(lie.quat_to_rotmat(qab))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    tau = rng.normal(size=(32, 6))
    T = lie.se3_exp(jnp.asarray(tau))
    tau2 = np.asarray(lie.se3_log(T))
    wn = np.linalg.norm(tau[:, :3], axis=-1)
    sel = wn < np.pi - 0.1
    np.testing.assert_allclose(tau2[sel], tau[sel], atol=1e-3)


def test_slerp_endpoints(rng):
    R = random_rotmats(rng, 4)
    q0 = lie.rotmat_to_quat(jnp.asarray(random_rotmats(rng, 4)))
    q1 = lie.rotmat_to_quat(jnp.asarray(R))
    s0 = np.asarray(lie.quat_slerp(q0, q1, jnp.zeros((4, 1))))
    s1 = np.asarray(lie.quat_slerp(q0, q1, jnp.ones((4, 1))))
    np.testing.assert_allclose(np.abs(np.sum(s0 * np.asarray(q0), -1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.sum(s1 * np.asarray(q1), -1)), 1.0, atol=1e-5)


def test_slerp_midpoint_is_geodesic(rng):
    w = rng.normal(size=(3,))
    R = lie.so3_exp(jnp.asarray(w))
    q0 = jnp.array([[1.0, 0, 0, 0]])
    q1 = lie.rotmat_to_quat(R)[None]
    qm = lie.quat_slerp(q0, q1, jnp.full((1, 1), 0.5))
    Rm_expected = np.asarray(lie.so3_exp(jnp.asarray(w * 0.5)))
    Rm = np.asarray(lie.quat_to_rotmat(qm))[0]
    np.testing.assert_allclose(Rm, Rm_expected, atol=1e-5)
