"""Point-cloud transforms: rigid transform, deskewing, cropping.

Covers utils/tools.py:590-637 (transform_torch / transform_batch_torch),
utils/tools.py:802-837 (deskewing by per-point timestamp slerp) and the
crop_frame filtering of utils/slam_dataset.py — but with *masked fixed-shape*
semantics: point sets are (points[N,3], mask[N]) pairs with static N, so all
of this jits on TPU. Filtering returns an updated mask instead of compacting.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import quat_slerp, quat_to_rotmat, rotmat_to_quat


def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply one rigid transform T[4,4] to points [N,3]."""
    return points @ T[:3, :3].T + T[:3, 3]


def transform_points_batch(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply per-point transforms T[N,4,4] to points [N,3]."""
    return jnp.einsum("nij,nj->ni", T[:, :3, :3], points) + T[:, :3, 3]


def deskew(
    points: jnp.ndarray,
    ts: jnp.ndarray,
    rel_pose: jnp.ndarray,
    ts_mid_pose: float = 0.5,
) -> jnp.ndarray:
    """Motion undistortion: move each point along the relative motion
    ``rel_pose`` (T_last<-cur) proportionally to its normalized timestamp.

    Semantics match utils/tools.py:802-837: ts normalized to [0,1] over the
    scan, re-centered at ``ts_mid_pose``, rotation slerped from identity,
    translation lerped.
    """
    if ts is None:
        return points
    ts = ts.reshape(-1)
    t_min, t_max = jnp.min(ts), jnp.max(ts)
    ts = (ts - t_min) / jnp.clip(t_max - t_min, 1e-12)
    ts = ts - ts_mid_pose

    q_rel = rotmat_to_quat(rel_pose[:3, :3])
    q_id = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=points.dtype)
    # slerp(I, R, t) handles negative t as extrapolation through the formula
    q_t = quat_slerp(
        jnp.broadcast_to(q_id, (points.shape[0], 4)),
        jnp.broadcast_to(q_rel, (points.shape[0], 4)),
        ts[:, None],
    )
    R_t = quat_to_rotmat(q_t)  # [N,3,3]
    tran = ts[:, None] * rel_pose[:3, 3]
    return jnp.einsum("nij,nj->ni", R_t, points) + tran


def adaptive_crop_range(points, max_range: float) -> float:
    """Adaptive max-range crop (ref utils/slam_dataset.py:395-404).

    inner = max over x,y of min(|axis max bound|, |axis min bound|): how far
    the scan extends symmetrically along each horizontal axis. The crop radius
    is 2*inner, capped at max_range. Host-side numpy (runs per frame before
    upload).
    """
    import numpy as _np

    mx = _np.abs(_np.asarray(points)[:, :3].max(0))
    mn = _np.abs(_np.asarray(points)[:, :3].min(0))
    inner = max(min(mx[0], mn[0]), min(mx[1], mn[1]))
    return min(float(max_range), 2.0 * float(inner))


def crop_mask(
    points: jnp.ndarray,
    min_z: float,
    max_z: float,
    min_range: float,
    max_range,
) -> jnp.ndarray:
    """Range/z crop as a boolean mask (no compaction)."""
    dist = jnp.linalg.norm(points, axis=-1)
    return (
        (dist > min_range)
        & (dist < max_range)
        & (points[:, 2] > min_z)
        & (points[:, 2] < max_z)
    )
