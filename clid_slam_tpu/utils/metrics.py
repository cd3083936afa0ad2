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


def _nn_dist_chunked(
    src: np.ndarray, dst: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """For each src point, distance to the nearest dst point. Brute-force
    in chunks (no KD-tree dependency; fine for <=1M-point eval clouds)."""
    src = np.asarray(src, np.float32)
    dst = np.asarray(dst, np.float32)
    out = np.empty(len(src), np.float32)
    d_sq = np.sum(dst * dst, axis=1)
    for i in range(0, len(src), chunk):
        s = src[i : i + chunk]
        # |s-d|^2 = |s|^2 - 2 s.d + |d|^2, rowwise min over dst
        cross = s @ dst.T
        d2 = np.sum(s * s, axis=1)[:, None] - 2.0 * cross + d_sq[None, :]
        out[i : i + chunk] = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
    return out


def mesh_f_score(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    threshold_m: float = 0.1,
    sample_n: int = 200_000,
    seed: int = 0,
) -> Dict[str, float]:
    """Reconstruction quality vs a ground-truth cloud: accuracy (pred->gt
    mean distance), completeness (gt->pred), precision/recall at
    ``threshold_m``, F-score, and Chamfer-L1 — the metric set of the
    reference's mesh evaluation workflow (tools.ipynb cells 5-14, which call
    the PIN-SLAM eval utilities over sampled mesh points vs a GT cloud).

    ``pred_points`` are points sampled from the reconstructed mesh surface
    (e.g. mesh vertices, or sample_mesh_points()); ``gt_points`` the
    reference cloud. Both are subsampled to ``sample_n`` points."""
    rng = np.random.default_rng(seed)
    pred = np.asarray(pred_points, np.float32).reshape(-1, 3)
    gt = np.asarray(gt_points, np.float32).reshape(-1, 3)
    if len(pred) == 0 or len(gt) == 0:
        return {
            "accuracy_m": float("inf"),
            "completeness_m": float("inf"),
            "chamfer_l1_m": float("inf"),
            "precision": 0.0,
            "recall": 0.0,
            "f_score": 0.0,
            "threshold_m": threshold_m,
        }
    if len(pred) > sample_n:
        pred = pred[rng.choice(len(pred), sample_n, replace=False)]
    if len(gt) > sample_n:
        gt = gt[rng.choice(len(gt), sample_n, replace=False)]
    d_pred_gt = _nn_dist_chunked(pred, gt)  # accuracy direction
    d_gt_pred = _nn_dist_chunked(gt, pred)  # completeness direction
    precision = float(np.mean(d_pred_gt < threshold_m))
    recall = float(np.mean(d_gt_pred < threshold_m))
    f = (
        2 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return {
        "accuracy_m": float(d_pred_gt.mean()),
        "completeness_m": float(d_gt_pred.mean()),
        "chamfer_l1_m": float(0.5 * (d_pred_gt.mean() + d_gt_pred.mean())),
        "precision": precision,
        "recall": recall,
        "f_score": float(f),
        "threshold_m": threshold_m,
    }


def sample_mesh_points(
    vertices: np.ndarray,
    triangles: np.ndarray,
    n: int = 200_000,
    seed: int = 0,
) -> np.ndarray:
    """Uniform-area sampling of points on a triangle mesh (the reference
    samples the reconstructed mesh with open3d's sample_points_uniformly
    before cloud-to-cloud eval; this is the numpy equivalent)."""
    rng = np.random.default_rng(seed)
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.int64).reshape(-1, 3)
    if len(t) == 0:
        return np.zeros((0, 3), np.float32)
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    if area.sum() <= 0:
        return np.zeros((0, 3), np.float32)
    pick = rng.choice(len(t), n, p=area / area.sum())
    r1 = np.sqrt(rng.random(n, dtype=np.float32))
    r2 = rng.random(n, dtype=np.float32)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2
    return (
        w0[:, None] * a[pick] + w1[:, None] * b[pick] + w2[:, None] * c[pick]
    ).astype(np.float32)
