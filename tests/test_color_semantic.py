"""Color (intensity) regression and semantic classification heads: the
optional second/third decoder paths (reference model/decoder.py heads +
utils/mapper.py:682-689, 800-830), plus mesh vertex attribute estimation
(utils/mesher.py:401-443)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.mesher import Mesher, SEM_KITTI_COLORS, filter_mesh_vertices
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets

RES = 0.3
F = 8
KNN = 6
SDF_SCALE = 0.055


@pytest.fixture(scope="module")
def trained():
    """Cylinder wall with intensity = f(angle), semantic label = quadrant;
    map + all three heads trained jointly."""
    rng = np.random.default_rng(0)
    n = 768
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    pts = np.stack([4 * np.cos(ang), 4 * np.sin(ang), z], -1).astype(np.float32)
    intensity = (0.5 * (np.sin(2 * ang) + 1)).astype(np.float32)[:, None]
    quadrant = (ang // (np.pi / 2)).astype(np.int32) + 1  # classes 1..4
    mask = jnp.ones((n,), bool)
    pose = jnp.eye(4)

    lmap = lm.init_local_map(1 << 13, 1 << 15)
    lmap = lm.update_local_map(
        lmap, jnp.zeros(3), jnp.asarray(pts), mask, 0.1, 100.0
    )
    batch = sample_rays(
        jax.random.PRNGKey(0),
        jnp.asarray(pts),
        mask,
        pose,
        lmap,
        0.1,
        surface_sample_range_m=0.25,
        surface_sample_n=3,
        free_front_n=2,
        free_behind_n=1,
        free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0,
        max_range=60.0,
        colors=jnp.asarray(intensity),
        sem_labels=jnp.asarray(quadrant),
    )
    nmap = nm.init_map(1 << 13, 1 << 15, F, color_feature_dim=F)
    travel = jnp.zeros((8,), jnp.float32)
    nmap, _ = nm.insert_points(
        nmap, batch.coords, batch.mask & (jnp.abs(batch.sdf_label) < 0.125),
        RES, travel, 0, 1e9,
    )
    pool = pl.init_pool(1 << 15, 1 << 15, color_channels=1)
    pool = pl.append_samples(
        pool, batch.coords, batch.sdf_label, batch.weight, batch.mask, 0,
        jnp.zeros_like(batch.mask), color=batch.color, sem=batch.sem,
    )

    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    color_mlp = dec.init_mlp(jax.random.PRNGKey(2), F + 3, 64, 1)
    sem_mlp = dec.init_mlp(
        jax.random.PRNGKey(3), F + 3, 64, 1, out_dim=5
    )  # classes 0..4
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    mapping = mp.make_mapping_fn(
        feature_dim=F, knn_k=KNN, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=SDF_SCALE, sigma=SDF_SCALE,
        bs=2048, bs_new=0, gradient_decimation=10, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
        color_on=True, sem_on=True, surface_sample_range_m=0.25,
    )
    nmap, mlp, color_mlp, sem_mlp, losses = mapping(
        nmap, mlp, color_mlp, sem_mlp, pool, travel, 0, 1e9,
        jax.random.PRNGKey(4), 300, 1.0,
    )
    assert np.isfinite(np.asarray(losses)).all()
    return nmap, mlp, color_mlp, sem_mlp, nb, mvd2, batch


def _wall_points(n=64):
    ang_q = np.linspace(0, 2 * np.pi, n, endpoint=False) + 0.02
    qpts = np.stack(
        [4 * np.cos(ang_q), 4 * np.sin(ang_q), np.zeros(n)], -1
    ).astype(np.float32)
    return ang_q, qpts


def test_sampler_labels(trained):
    batch = trained[6]
    n = 768
    cl = np.asarray(batch.color)
    sm = np.asarray(batch.sem)
    assert cl.shape == (n * 7, 1)
    assert (sm[: 4 * n] >= 1).all()  # endpoint+surface blocks labeled
    assert (sm[4 * n :] == 0).all()  # freespace class 0


def test_color_and_semantic_training(trained):
    nmap, mlp, color_mlp, sem_mlp, nb, mvd2, _ = trained
    ang_q, qpts = _wall_points()
    q = nm.query_feature(nmap, jnp.asarray(qpts), nb, RES, mvd2, KNN)
    cfeat = nm.query_color_feature(nmap, q, F)
    cpred = np.asarray(dec.regress_color(color_mlp, cfeat))[:, 0]
    truth = 0.5 * (np.sin(2 * ang_q) + 1)
    okq = np.asarray(q.nn_count) >= 3
    assert okq.sum() > 40
    corr = np.corrcoef(cpred[okq], truth[okq])[0, 1]
    assert corr > 0.7, corr

    logp = np.asarray(dec.sem_label_prob(sem_mlp, q.feature))
    pred_cls = logp.argmax(-1)
    truth_cls = (ang_q // (np.pi / 2)).astype(int) + 1
    acc = (pred_cls[okq] == truth_cls[okq]).mean()
    assert acc > 0.7, acc


def test_mesher_vertex_attributes(trained):
    """Mesher vertex color/semantic estimation must agree with direct head
    queries and filter free-space vertices."""
    nmap, mlp, color_mlp, sem_mlp, nb, mvd2, _ = trained
    mesher = Mesher(
        knn_k=KNN, nb_offs=nb, resolution=RES, max_valid_dist2=mvd2,
        sdf_scale=SDF_SCALE, mesh_min_nn=3, chunk_dim=8, feature_dim=F,
    )
    ang_q, qpts = _wall_points(96)
    colors = mesher.estimate_vertex_colors(nmap, color_mlp, qpts, color_channel=1)
    assert colors.shape == (96, 3)
    # intensity repeated to gray
    np.testing.assert_allclose(colors[:, 0], colors[:, 1])
    q = nm.query_feature(nmap, jnp.asarray(qpts), nb, RES, mvd2, KNN)
    okq = np.asarray(q.nn_count) >= 3
    truth = 0.5 * (np.sin(2 * ang_q) + 1)
    corr = np.corrcoef(colors[okq, 0], np.clip(truth * 2, 0, 1)[okq])[0, 1]
    assert corr > 0.6, corr

    labels, keep = mesher.estimate_vertex_sem(nmap, sem_mlp, qpts)
    truth_cls = (ang_q // (np.pi / 2)).astype(int) + 1
    acc = (labels[okq] == truth_cls[okq]).mean()
    assert acc > 0.7, acc
    # far free-space points are dropped by the keep mask
    far = np.full((16, 3), 50.0, np.float32)
    _, keep_far = mesher.estimate_vertex_sem(nmap, sem_mlp, far)
    assert not keep_far.any()

    # filter_mesh_vertices drops masked vertices and their triangles
    verts = qpts[:6]
    tris = np.array([[0, 1, 2], [2, 3, 4], [3, 4, 5]])
    keep6 = np.array([True, True, True, False, True, True])
    v2, t2, kept = filter_mesh_vertices(verts, tris, keep6)
    assert len(v2) == 5 and len(t2) == 1 and (t2 == [[0, 1, 2]]).all()
    assert SEM_KITTI_COLORS.shape == (20, 3)
