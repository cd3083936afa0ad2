"""Mesh-quality evaluation (F-score vs GT cloud): the numeric equivalent of
the reference's mesh-eval workflow (tools.ipynb cells 5-14)."""

import numpy as np
import pytest

from clid_slam_tpu.utils.metrics import mesh_f_score, sample_mesh_points


def _unit_cube_mesh():
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float32,
    )
    t = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int64,
    )
    return v, t


def test_mesh_sampling_on_surface():
    v, t = _unit_cube_mesh()
    pts = sample_mesh_points(v, t, n=5000, seed=1)
    assert pts.shape == (5000, 3)
    # every sample lies on a face of the cube: at least one coordinate is
    # 0 or 1 (within fp eps) and all inside [0,1]
    on_face = np.any(
        (np.abs(pts) < 1e-5) | (np.abs(pts - 1.0) < 1e-5), axis=1
    )
    assert on_face.all()
    assert (pts >= -1e-5).all() and (pts <= 1 + 1e-5).all()


def test_f_score_perfect_match():
    v, t = _unit_cube_mesh()
    a = sample_mesh_points(v, t, n=20000, seed=1)
    b = sample_mesh_points(v, t, n=20000, seed=2)
    m = mesh_f_score(a, b, threshold_m=0.05)
    assert m["f_score"] > 0.99
    assert m["chamfer_l1_m"] < 0.02


def test_f_score_detects_offset():
    v, t = _unit_cube_mesh()
    a = sample_mesh_points(v, t, n=10000, seed=1)
    b = a + np.array([0.2, 0.0, 0.0], np.float32)
    m = mesh_f_score(a, b, threshold_m=0.05)
    assert m["f_score"] < 0.6  # most faces shifted out of threshold
    assert m["chamfer_l1_m"] > 0.05


def test_f_score_incomplete_reconstruction():
    v, t = _unit_cube_mesh()
    gt = sample_mesh_points(v, t, n=20000, seed=1)
    # reconstruction covers only half the surface (z < 0.5)
    pred = gt[gt[:, 2] < 0.5]
    m = mesh_f_score(pred, gt, threshold_m=0.05)
    assert m["precision"] > 0.95  # what exists is accurate
    assert m["recall"] < 0.8  # but incomplete
    assert m["completeness_m"] > m["accuracy_m"]


def test_f_score_empty_inputs():
    m = mesh_f_score(np.zeros((0, 3)), np.ones((10, 3)))
    assert m["f_score"] == 0.0 and np.isinf(m["completeness_m"])
