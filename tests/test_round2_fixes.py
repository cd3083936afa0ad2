"""Round-2 behavioral fixes: pool overflow parity, weighted_first=False,
layer_norm_on, frontend color/sem ingestion, las/NCLT loaders, dataset
indexing families, streaming-capacity growth, point-guided meshing."""

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clid_slam_tpu.config import Config
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets
from clid_slam_tpu.utils import io


# ------------------------------------------------------------ pool overflow


def test_pool_overflow_replaces_random_old():
    """When the pool is full, new samples evict random old slots instead of
    being dropped (utils/mapper.py:350-358 parity)."""
    cap = 64
    pool = pl.init_pool(cap, 16)
    k = jax.random.PRNGKey(0)

    # fill to capacity with ts=0 samples
    m = 64
    coords = jnp.ones((m, 3)) * 5.0
    pool = pl.append_samples(
        pool, coords, jnp.zeros(m), jnp.ones(m), jnp.ones(m, bool), 0,
        jnp.zeros(m, bool), key=k,
    )
    assert int(pool.size) == cap
    assert int(jnp.sum(pool.ts == 0)) == cap

    # append another full frame with ts=1: must overwrite some old slots
    pool = pl.append_samples(
        pool, coords * 2.0, jnp.ones(m), jnp.ones(m), jnp.ones(m, bool), 1,
        jnp.zeros(m, bool), key=jax.random.PRNGKey(1),
    )
    assert int(pool.size) == cap  # capped
    n_new = int(jnp.sum(pool.ts == 1))
    assert n_new > cap // 4  # a solid fraction of evictions landed
    assert int(jnp.sum(pool.ts == 0)) == cap - n_new


def test_pool_append_without_key_drops_new():
    cap = 8
    pool = pl.init_pool(cap, 4)
    m = 16
    pool = pl.append_samples(
        pool, jnp.ones((m, 3)), jnp.zeros(m), jnp.ones(m),
        jnp.ones(m, bool), 0, jnp.zeros(m, bool),
    )
    assert int(pool.size) == cap


# ----------------------------------------------- weighted_first / layer_norm


def _tiny_map(rng, n=200, res=0.3):
    pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    state = nm.init_map(1 << 10, 1 << 12, 8)
    td = jnp.zeros((8,), jnp.float32)
    state, _ = nm.insert_points(
        state, jnp.asarray(pts), jnp.ones((n,), bool), res, td, 0, 1e9,
        downsample=False,
    )
    cnt = int(state.count)
    state = state._replace(
        geo_feats=state.geo_feats.at[:cnt].set(
            jnp.asarray(rng.standard_normal((cnt, 8)).astype(np.float32))
        )
    )
    return state, td


def test_weighted_first_false_shapes_and_mean(rng):
    state, td = _tiny_map(rng)
    nb = neighbor_offsets(2, 0.2)
    q_pts = jnp.asarray(rng.uniform(-2, 2, (32, 3)).astype(np.float32))
    mvd2 = 3.0 * (3 * 0.3) ** 2

    q_w = nm.query_feature(
        state, q_pts, nb, 0.3, mvd2, 6, td, 0, 1e9, True, weighted_first=True
    )
    q_k = nm.query_feature(
        state, q_pts, nb, 0.3, mvd2, 6, td, 0, 1e9, True, weighted_first=False
    )
    assert q_k.feature.shape == (32, 6, 8 + 3)
    # weighted mean of per-neighbor features == weighted-first feature
    recon = jnp.sum(q_k.feature * q_k.weights[..., None], axis=1)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(q_w.feature), atol=1e-5
    )
    # a LINEAR decoder commutes with the weighting: decode-then-weight must
    # equal weight-then-decode
    w = jnp.asarray(rng.standard_normal((11, 1)).astype(np.float32))
    lin = dec.MLPParams(weights=[], biases=[], w_out=w, b_out=jnp.zeros((1,)))
    sdf_w = dec.sdf(lin, q_w.feature, 1.0)
    sdf_k = jnp.sum(dec.sdf(lin, q_k.feature, 1.0) * q_k.weights, axis=1)
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_w), atol=1e-5)


def test_layer_norm_on(rng):
    state, td = _tiny_map(rng)
    nb = neighbor_offsets(2, 0.2)
    q_pts = jnp.asarray(rng.uniform(-2, 2, (16, 3)).astype(np.float32))
    mvd2 = 3.0 * (3 * 0.3) ** 2
    q = nm.query_feature(
        state, q_pts, nb, 0.3, mvd2, 6, td, 0, 1e9, True,
        weighted_first=False, layer_norm=True,
    )
    feats = np.asarray(q.feature[..., :8])
    valid = np.asarray(q.knn_idx >= 0)
    if valid.any():
        f = feats[valid]
        np.testing.assert_allclose(f.mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(f.std(-1), 1.0, atol=1e-2)


def test_h_reduce_weighted_first_false_runs(rng):
    from clid_slam_tpu.odometry import iekf

    state, td = _tiny_map(rng, n=500)
    nb = neighbor_offsets(2, 0.2)
    mvd2 = 3.0 * (3 * 0.3) ** 2
    mlp = dec.init_mlp(jax.random.PRNGKey(0), 11, 32, 1, 1)
    h_red = iekf.make_h_reduce_fn(
        knn_k=6, nb_offs=nb, resolution=0.3, max_valid_dist2=mvd2,
        sdf_scale=0.1, min_grad_norm=0.0, max_grad_norm=100.0,
        min_nn_count=1, weighted_first=False, max_sdf_std=10.0,
    )
    pts = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    S6, b6, nv, nt = h_red(
        state, mlp, pts, jnp.ones(64, bool), jnp.eye(3), jnp.zeros(3),
        td, 0, 1e9,
    )
    assert S6.shape == (6, 6) and b6.shape == (6,)
    assert np.isfinite(np.asarray(S6)).all()
    # a tight std gate must reduce the valid count (or keep it equal)
    h_red_tight = iekf.make_h_reduce_fn(
        knn_k=6, nb_offs=nb, resolution=0.3, max_valid_dist2=mvd2,
        sdf_scale=0.1, min_grad_norm=0.0, max_grad_norm=100.0,
        min_nn_count=1, weighted_first=False, max_sdf_std=0.0,
    )
    _, _, nv_tight, _ = h_red_tight(
        state, mlp, pts, jnp.ones(64, bool), jnp.eye(3), jnp.zeros(3),
        td, 0, 1e9,
    )
    assert float(nv_tight) <= float(nv)
    assert float(nv_tight) == 0.0  # zero tolerance kills everything


# -------------------------------------------------------------- IO loaders


def test_las_roundtrip(tmp_path):
    """Write a minimal LAS 1.2 point-format-0 file and read it back."""
    pts = np.array([[1.5, -2.25, 3.0], [10.0, 20.0, -30.0]], np.float64)
    scale = np.array([0.001, 0.001, 0.001])
    offset = np.array([0.0, 0.0, 0.0])
    xyz = np.round((pts - offset) / scale).astype(np.int32)
    point_size = 20
    n = len(pts)
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1  # version major
    header[25] = 2  # version minor
    struct.pack_into("<H", header, 94, 227)  # header size
    struct.pack_into("<I", header, 96, 227)  # point data offset
    header[104] = 0  # point format
    struct.pack_into("<H", header, 105, point_size)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)
    rec = np.zeros((n, point_size), np.uint8)
    for i in range(n):
        rec[i, :12] = np.frombuffer(xyz[i].astype("<i4").tobytes(), np.uint8)
        struct.pack_into("<H", rec[i], 12, 1000 + i)  # intensity
    p = tmp_path / "test.las"
    with open(p, "wb") as f:
        f.write(bytes(header))
        f.write(rec.tobytes())
    out = io.read_las(str(p), color_channel=1)
    np.testing.assert_allclose(out[:, :3], pts, atol=1e-3)
    np.testing.assert_allclose(out[:, 3], [1000, 1001])
    # through the generic dispatcher too
    out2, ts = io.read_point_cloud(str(p), 1)
    np.testing.assert_allclose(out2[:, :3], pts, atol=1e-3)


def test_nclt_bin(tmp_path):
    xyz = np.array([[50.5, -3.25, 7.0]], np.float32)
    x_s = np.round((xyz[:, 0] + 100.0) / 0.005).astype(np.int16)
    y_s = np.round((-xyz[:, 1] + 100.0) / 0.005).astype(np.int16)
    z_s = np.round((-xyz[:, 2] + 100.0) / 0.005).astype(np.int16)
    rec = np.stack(
        [x_s, y_s, z_s, np.zeros_like(x_s)], -1
    ).astype(np.int16)
    p = tmp_path / "velo.bin"
    rec.tofile(p)
    out = io.load_nclt_bin(str(p))
    np.testing.assert_allclose(out, xyz, atol=0.01)


def test_semantic_label_reading(tmp_path):
    pts = np.random.default_rng(0).uniform(-10, 10, (6, 4)).astype(np.float32)
    raw = np.array([0, 10, 40, 252, 1, 50], np.uint32)  # + instance bits
    labels = raw | (np.uint32(7) << 16)
    bin_p, lbl_p = tmp_path / "000000.bin", tmp_path / "000000.label"
    pts.tofile(bin_p)
    labels.tofile(lbl_p)
    points, full, reduced = io.read_semantic_point_label(str(bin_p), str(lbl_p))
    assert points.shape == (6, 4)
    np.testing.assert_array_equal(full, raw.astype(np.int32))
    np.testing.assert_array_equal(reduced, [0, 1, 9, 1, 0, 13])
    keep = io.filter_sem_kitti_mask(full, True, False)
    np.testing.assert_array_equal(keep, [False, True, True, True, False, True])
    keep_static = io.filter_sem_kitti_mask(full, True, True)
    np.testing.assert_array_equal(
        keep_static, [False, True, True, False, False, True]
    )


# -------------------------------------------------- frontend color/sem flow


def test_dataset_color_sem_ingestion(tmp_path):
    from clid_slam_tpu.pipeline.dataset import SLAMDataset

    cfg = Config()
    cfg.color_channel = 1
    cfg.color_on = True
    cfg.semantic_on = True
    cfg.max_scan_points = 256
    cfg.min_range = 0.0
    cfg.track_on = False
    cfg._derive()
    d = SLAMDataset(cfg, min_frames=4)
    rng = np.random.default_rng(1)
    n = 100
    pts = np.concatenate(
        [
            rng.uniform(2, 10, (n, 3)).astype(np.float32),
            rng.uniform(0, 255, (n, 1)).astype(np.float32),
        ],
        axis=1,
    )
    sem = rng.integers(0, 20, n).astype(np.int32)
    d.read_frame_arrays(pts, None, sem)
    assert d.preprocess_frame()
    assert d.cur_colors is not None and d.cur_colors.shape == (256, 1)
    assert d.cur_sem is not None and d.cur_sem.shape == (256,)
    # color normalized by 255 for non-kitti
    assert float(jnp.max(d.cur_colors)) <= 1.0
    # padding rows are -1 labels
    assert int(d.cur_sem[255]) == -1


def test_rand_downsample(tmp_path):
    from clid_slam_tpu.pipeline.dataset import SLAMDataset

    cfg = Config()
    cfg.rand_downsample = True
    cfg.rand_down_r = 0.25
    cfg.max_scan_points = 1024
    cfg.min_range = 0.0
    cfg.track_on = False
    cfg._derive()
    d = SLAMDataset(cfg, min_frames=4)
    pts = np.random.default_rng(0).uniform(2, 30, (1024, 3)).astype(np.float32)
    d.read_frame_arrays(pts)
    assert d.preprocess_frame()
    frac = float(jnp.mean(d.cur_mask.astype(jnp.float32)))
    assert 0.15 < frac < 0.35


# ------------------------------------------------------- dataset indexing


def test_dataset_indexing_families():
    from clid_slam_tpu.pipeline.dataset_indexing import set_dataset_path

    for fam, expect in [
        ("ncd", "01/bin"),
        ("ncd128", "01/ply"),
        ("hilti", "01/ply"),
        ("kitti_carla", "01/generated/frames"),
        ("ipbcar", "01/ouster"),
        ("clid", "01/lidar"),
    ]:
        cfg = Config()
        cfg.pc_path = "/data/ds/seq/pc"
        set_dataset_path(cfg, fam, "01")
        assert cfg.pc_path.endswith(expect), (fam, cfg.pc_path)
    cfg = Config()
    cfg.pc_path = "/data/kitti/sequences/00/velodyne"
    set_dataset_path(cfg, "kitti", "7")
    assert cfg.pc_path == "/data/kitti/sequences/07/velodyne"
    assert cfg.kitti_correction_on and cfg.correction_deg == 0.195
    with pytest.raises(ValueError):
        set_dataset_path(Config(), "nope", "0")


# --------------------------------------------------- streaming growth


def test_travel_dist_growth():
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = Config()
    cfg.track_on = False
    cfg.map_capacity = 1 << 10
    cfg.map_hash_size = 1 << 12
    cfg.local_map_capacity = 1 << 10
    cfg.local_map_hash_size = 1 << 12
    cfg.max_scan_points = 128
    cfg.pool_capacity = 1 << 12
    cfg.iters = 1
    cfg.init_iter_ratio = 1
    cfg.bs = 64
    cfg.bs_new_sample = 0
    cfg._derive()
    sys_ = SlamSystem(cfg, total_frames=2)
    assert sys_.total_frames == 2
    sys_._ensure_capacity(5)
    assert sys_.total_frames >= 6
    assert sys_.travel_dist_dev.shape[0] == sys_.total_frames
    assert len(sys_.dataset.odom_poses) >= sys_.total_frames
