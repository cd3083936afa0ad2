"""SO(3)/SE(3) Lie-group math and quaternion utilities, JAX-native.

Covers the capabilities of the reference's utils/so3_math.py (skew, so3 exp /
log, the A(θ)ᵀ Jacobian) and the quaternion/transform helpers in
utils/tools.py:484-636, but written branch-free (jnp.where for small-angle
series) so everything traces under jit and vmaps over batches. All functions
accept leading batch dimensions.

Quaternion convention: wxyz (scalar first), matching the reference
(model/neural_points.py:395 initializes [1,0,0,0]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _outer(w: jnp.ndarray) -> jnp.ndarray:
    """w wᵀ as a broadcast multiply — NOT a matmul. On TPU, 3x3 dot_general
    defaults to bf16 inputs on the MXU (≈1e-3 relative error, enough to
    break so3_log near θ=π); broadcasting stays on the VPU in full f32.
    Identity used below: W@W = w wᵀ − (wᵀw) I for W = skew(w)."""
    return w[..., :, None] * w[..., None, :]


def _matvec3(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[...,3,3] @ [...,3] via multiply+reduce (VPU f32, not bf16 MXU)."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix [v]_x."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: so(3) vector [..., 3] -> rotation matrix [..., 3, 3].

    Small-angle: sin θ/θ → 1, (1-cos θ)/θ² → 1/2 (Taylor). The untaken
    branch of each jnp.where is evaluated at θ²=1 so its *gradient* stays
    finite at θ=0 (0·inf = NaN otherwise — the classic where pitfall).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)  # gradient-safe branch input
    ts = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(ts)) / t2s)
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    bb = b[..., None, None]
    return (
        (1.0 - bb * theta2[..., None, None]) * I
        + a[..., None, None] * W
        + bb * _outer(w)
    )


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> so(3) vector [..., 3].

    Matches the reference series (utils/so3_math.py:53-73): scale·w with
    w = vee(R - Rᵀ), scale = 0.5 θ/sin θ (small-angle 0.5 + θ²/12).
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = jnp.abs(theta) < 1e-4
    theta_s = jnp.where(small, 1.0, theta)  # gradient-safe branch input
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        0.5 * theta_s / (jnp.sin(theta_s) + _EPS),
    )
    return scale[..., None] * w


def so3_jacobian_right_T(v: jnp.ndarray) -> jnp.ndarray:
    """A(v)ᵀ from the reference (utils/so3_math.py:76-88): the transposed
    left Jacobian of SO(3); used by the ESKF noise propagation."""
    n2 = jnp.sum(v * v, axis=-1)
    n = jnp.sqrt(n2 + _EPS * _EPS)
    small = n2 < 1e-22
    t1 = jnp.where(small, 0.5, (1.0 - jnp.cos(n)) / n2.clip(1e-24))
    t2 = jnp.where(small, 1.0 / 6.0, (1.0 - jnp.sin(n) / n) / n2.clip(1e-24))
    S = skew(v)
    I = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), S.shape)
    tt2 = t2[..., None, None]
    return (1.0 - tt2 * n2[..., None, None]) * I + t1[..., None, None] * S + tt2 * _outer(v)


# ---------------------------------------------------------------- SE(3)


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """se(3) [..., 6] (rot first, then trans) -> [..., 4, 4]."""
    w, u = tau[..., :3], tau[..., 3:]
    R = so3_exp(w)
    # left Jacobian V (gradient-safe branches, see so3_exp)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)
    ts = jnp.sqrt(t2s)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(ts)) / t2s)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (ts - jnp.sin(ts)) / (t2s * ts)
    )
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=tau.dtype), W.shape)
    cc = c[..., None, None]
    V = (1.0 - cc * theta2[..., None, None]) * I + b[..., None, None] * W + cc * _outer(w)
    t = _matvec3(V, u)
    T = jnp.zeros(tau.shape[:-1] + (4, 4), dtype=tau.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] -> se(3) [..., 6] (rot, trans)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)
    ts = jnp.sqrt(t2s)
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/θ² - (1+cos θ)/(2 θ sin θ)) W²
    coef = jnp.where(
        small,
        1.0 / 12.0,
        1.0 / t2s - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts) + _EPS),
    )
    cf = coef[..., None, None]
    Vinv = (1.0 - cf * theta2[..., None, None]) * I - 0.5 * W + cf * _outer(w)
    u = _matvec3(Vinv, t)
    return jnp.concatenate([w, u], axis=-1)


# ------------------------------------------------------------ quaternions


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors [..., 3] by quaternions [..., 4] (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> wxyz quaternion; branch-free Shepperd-style using the
    max-trace-component trick expressed with jnp.where."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate solutions
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions; t broadcastable.

    Replaces roma.rotmat_slerp used for deskewing (utils/tools.py:826-828).
    """
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d).clip(-1.0, 1.0)
    theta = jnp.arccos(d.clip(max=1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    small = d > 1.0 - 1e-6
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / (sin_theta + _EPS))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / (sin_theta + _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)
