"""Trajectory evaluation: ATE (Horn-aligned RMSE) and KITTI relative drift.

Pure-numpy port of the *semantics* of utils/eval_traj_utils.py:11-174
(which is itself pure numpy in the reference): SE(3) alignment by the
closed-form Horn/Umeyama solution, translation/rotation RMSE, and the KITTI
odometry benchmark's segment-based relative errors over lengths
100..800 m evaluated every ``step`` frames.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def align_se3(est_xyz: np.ndarray, gt_xyz: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form rigid alignment est->gt (rotation R, translation t)."""
    mu_e = est_xyz.mean(0)
    mu_g = gt_xyz.mean(0)
    E = est_xyz - mu_e
    G = gt_xyz - mu_g
    W = G.T @ E
    U, _, Vt = np.linalg.svd(W)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_g - R @ mu_e
    return R, t


def absolute_error(
    est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True
) -> Dict[str, float]:
    """ATE translation RMSE (+ mean/median) and rotation RMSE (deg) after
    optional SE(3) alignment (utils/eval_traj_utils.py:11-107)."""
    n = min(len(est_poses), len(gt_poses))
    est = np.asarray(est_poses[:n], np.float64)
    gt = np.asarray(gt_poses[:n], np.float64)
    e_xyz = est[:, :3, 3]
    g_xyz = gt[:, :3, 3]
    if align and n >= 3:
        R, t = align_se3(e_xyz, g_xyz)
        e_xyz = e_xyz @ R.T + t
        e_rot = np.einsum("ij,njk->nik", R, est[:, :3, :3])
    else:
        e_rot = est[:, :3, :3]
    terr = np.linalg.norm(e_xyz - g_xyz, axis=-1)
    ate_rmse = float(np.sqrt(np.mean(terr**2)))

    rel = np.einsum("nij,nik->njk", gt[:, :3, :3], e_rot)  # gtᵀ·est
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    are_rmse = float(np.sqrt(np.mean(ang**2)))
    return {
        "ate_rmse_m": ate_rmse,
        "ate_mean_m": float(terr.mean()),
        "ate_median_m": float(np.median(terr)),
        "are_rmse_deg": are_rmse,
    }


def _trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
    return np.concatenate([[0.0], np.cumsum(d)])


def _last_frame_from_segment(dist: np.ndarray, first: int, length: float) -> int:
    target = dist[first] + length
    idx = np.searchsorted(dist, target)
    return int(idx) if idx < len(dist) else -1


def relative_error(
    gt_poses: np.ndarray,
    est_poses: np.ndarray,
    lengths: List[float] = (100, 200, 300, 400, 500, 600, 700, 800),
    step: int = 10,
) -> Dict[str, float]:
    """KITTI drift: average translational error [%] and rotational error
    [deg/100m] over fixed-length segments (utils/eval_traj_utils.py:110-174)."""
    n = min(len(gt_poses), len(est_poses))
    gt = np.asarray(gt_poses[:n], np.float64)
    est = np.asarray(est_poses[:n], np.float64)
    dist = _trajectory_distances(gt)
    t_errs, r_errs = [], []
    for first in range(0, n, step):
        for length in lengths:
            last = _last_frame_from_segment(dist, first, length)
            if last < 0:
                continue
            gt_rel = np.linalg.inv(gt[first]) @ gt[last]
            est_rel = np.linalg.inv(est[first]) @ est[last]
            err = np.linalg.inv(est_rel) @ gt_rel
            t_err = np.linalg.norm(err[:3, 3])
            tr = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
            r_err = np.arccos(tr)
            t_errs.append(t_err / length)
            r_errs.append(r_err / length)
    if not t_errs:
        return {"drift_t_percent": float("nan"), "drift_r_deg_per_100m": float("nan")}
    return {
        "drift_t_percent": float(np.mean(t_errs) * 100.0),
        "drift_r_deg_per_100m": float(np.degrees(np.mean(r_errs)) * 100.0),
    }
