"""Spatial map-block sharding over a virtual 8-device CPU mesh: sharded
insert/query must reproduce single-map semantics, and the sharded training
step must learn — the new-capability analog of SURVEY.md §2.3's map-block
sharding plan (the reference has no distributed backend at all)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets
from clid_slam_tpu.parallel import spatial as sp

RES = 0.3
F = 8
KNN = 6
NB = neighbor_offsets(2, 0.5)
MVD2 = 3.0 * (3 * RES) ** 2


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return sp.make_spatial_mesh(8)


@pytest.fixture(scope="module")
def fns(mesh):
    return sp.make_spatial_fns(
        mesh,
        feature_dim=F, knn_k=KNN, nb_offs=NB, resolution=RES,
        max_valid_dist2=MVD2, sdf_scale=0.055, sigma=0.055,
        bs=1024, bs_new=0, gradient_decimation=8, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.02,
    )


def test_owner_balanced_and_consistent(rng):
    pts = rng.uniform(-50, 50, size=(20000, 3)).astype(np.float32)
    own = np.asarray(sp.shard_owner(jnp.asarray(pts), RES, 8))
    counts = np.bincount(own, minlength=8)
    assert counts.min() > 0.8 * counts.mean()
    # same voxel -> same owner
    jit = pts + np.float32(RES * 0.01)  # tiny in-voxel jitter (mostly)
    same_vox = (
        np.floor(pts / RES).astype(int) == np.floor(jit / RES).astype(int)
    ).all(-1)
    own2 = np.asarray(sp.shard_owner(jnp.asarray(jit), RES, 8))
    assert (own[same_vox] == own2[same_vox]).all()


def test_sharded_insert_disjoint(mesh, fns, rng):
    insert_fn, _, _ = fns
    sstate = sp.init_sharded_map(mesh, 1 << 12, 1 << 14, F)
    pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
    travel = jnp.zeros((8,), jnp.float32)
    sstate, ratio = insert_fn(
        sstate, jnp.asarray(pts), jnp.ones((len(pts),), bool), travel, 0, 1e9
    )
    counts = np.asarray(sstate.count)
    n_vox = len(np.unique(np.floor(pts / RES).astype(int), axis=0))
    assert abs(counts.sum() - n_vox) <= 0.02 * n_vox
    # every live point sits on the shard that owns its voxel
    for s in range(8):
        n = int(counts[s])
        if n == 0:
            continue
        own = np.asarray(
            sp.shard_owner(sstate.positions[s, :n], RES, 8)
        )
        assert (own == s).all()
    assert 0.9 < float(ratio) <= 1.0


def test_sharded_query_matches_single_map(mesh, fns, rng):
    """The combined sharded query must agree with a single unsharded map
    holding the same points: same neighbor counts (modulo rare hash-table
    differences), same interpolated features."""
    insert_fn, query_fn, _ = fns
    # isolated clusters so kNN sets are unambiguous (see test_neural_map)
    centers = rng.uniform(-15, 15, size=(32, 3)).astype(np.float32)
    pts = (
        centers[:, None, :]
        + rng.uniform(-0.25, 0.25, size=(32, 4, 3)).astype(np.float32)
    ).reshape(-1, 3)
    travel = jnp.zeros((8,), jnp.float32)
    mask = jnp.ones((len(pts),), bool)

    single = nm.init_map(1 << 12, 1 << 14, F)
    single, _ = nm.insert_points(
        single, jnp.asarray(pts), mask, RES, travel, 0, 1e9
    )
    feats = rng.normal(size=single.geo_feats.shape).astype(np.float32)
    # map each single-map point's features into the sharded slabs by
    # position match after sharded insert
    sstate = sp.init_sharded_map(mesh, 1 << 12, 1 << 14, F)
    sstate, _ = insert_fn(sstate, jnp.asarray(pts), mask, travel, 0, 1e9)

    n1 = int(single.count)
    single = single._replace(geo_feats=jnp.asarray(feats))
    p1 = np.asarray(single.positions[:n1])
    sfeats = np.array(sstate.geo_feats)
    for s in range(8):
        ns = int(np.asarray(sstate.count)[s])
        ps = np.asarray(sstate.positions[s, :ns])
        # match by nearest single-map point (identical positions)
        d = np.linalg.norm(ps[:, None, :] - p1[None, :, :], axis=-1)
        j = d.argmin(1)
        assert (d.min(1) < 1e-6).all()
        sfeats[s, :ns] = feats[j]
    sstate = sstate._replace(geo_feats=jnp.asarray(sfeats))

    q = (centers + rng.uniform(-0.05, 0.05, size=centers.shape)).astype(
        np.float32
    )
    r1 = nm.query_feature(single, jnp.asarray(q), NB, RES, MVD2, KNN)
    r2 = query_fn(sstate, jnp.asarray(q), travel, 0, 1e9)
    n_a = np.asarray(r1.nn_count)
    n_b = np.asarray(r2.nn_count)
    ok = (n_a == n_b) & (n_a > 0)
    assert ok.sum() >= 0.8 * len(q)
    np.testing.assert_allclose(
        np.asarray(r2.feature)[ok], np.asarray(r1.feature)[ok], atol=2e-4
    )
    # local knn_idx: each selected slot is claimed by exactly one shard
    ki = np.asarray(r2.knn_idx)  # [S,N,k]
    claims = (ki >= 0).sum(0)  # [N,k]
    w = np.asarray(r2.weights)
    assert (claims[w > 0] == 1).all()


def test_sharded_training_learns(mesh, fns, rng):
    """Sharded mapping step drives the SDF loss down on a sphere scene."""
    from clid_slam_tpu.mapping import pool as pl

    insert_fn, query_fn, mapping_fn = fns
    # sphere surface samples + sdf labels from radius offsets
    n = 4096
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    off = rng.uniform(-0.3, 0.3, size=(n, 1)).astype(np.float32)
    coords = ((4.0 + off) * dirs).astype(np.float32)
    sdf_label = off[:, 0]  # signed distance to r=4 sphere

    travel = jnp.zeros((8,), jnp.float32)
    surf = np.abs(sdf_label) < 0.1
    sstate = sp.init_sharded_map(mesh, 1 << 12, 1 << 14, F)
    sstate, _ = insert_fn(
        sstate, jnp.asarray(coords), jnp.asarray(surf), travel, 0, 1e9
    )
    assert sp.total_count(sstate) > 200

    pool = pl.init_pool(1 << 13, 1 << 13)
    pool = pl.append_samples(
        pool, jnp.asarray(coords), jnp.asarray(sdf_label),
        jnp.ones((n,), jnp.float32), jnp.ones((n,), bool), 0,
        jnp.zeros((n,), bool),
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    sstate, mlp, losses1 = mapping_fn(
        sstate, mlp, pool, travel, 0, 1e9, jax.random.PRNGKey(2), 10, 1.0
    )
    l1 = float(np.asarray(losses1)[0])
    sstate, mlp, losses2 = mapping_fn(
        sstate, mlp, pool, travel, 0, 1e9, jax.random.PRNGKey(3), 60, 1.0
    )
    l2 = float(np.asarray(losses2)[0])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1 * 0.8, (l1, l2)

    # certainty accumulated on the owning shards
    assert float(np.asarray(sstate.certainty).sum()) > 0


def test_batch_sharded_matches_replicated(mesh, rng):
    """The DP x SP batch-sharded mapping (psum_scatter combine, per-chunk
    MLP/loss, psum'd MLP grads) must match the replicated-batch body
    numerically — this pins the collective-transpose gradient routing
    (every chunk's feature cotangent reaching every owning shard)."""
    from clid_slam_tpu.mapping import pool as pl

    n = 4096
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    off = rng.uniform(-0.3, 0.3, size=(n, 1)).astype(np.float32)
    coords = ((4.0 + off) * dirs).astype(np.float32)
    sdf_label = off[:, 0]
    travel = jnp.zeros((8,), jnp.float32)
    surf = np.abs(sdf_label) < 0.1

    kw = dict(
        feature_dim=F, knn_k=KNN, nb_offs=NB, resolution=RES,
        max_valid_dist2=MVD2, sdf_scale=0.055, sigma=0.055,
        bs=1024, bs_new=0, gradient_decimation=8, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.02,
    )

    def run(batch_shard):
        insert_fn, _, mapping_fn = sp.make_spatial_fns(
            mesh, batch_shard=batch_shard, **kw
        )
        sstate = sp.init_sharded_map(mesh, 1 << 12, 1 << 14, F)
        sstate, _ = insert_fn(
            sstate, jnp.asarray(coords), jnp.asarray(surf), travel, 0, 1e9
        )
        pool = pl.init_pool(1 << 13, 1 << 13)
        pool = pl.append_samples(
            pool, jnp.asarray(coords), jnp.asarray(sdf_label),
            jnp.ones((n,), jnp.float32), jnp.ones((n,), bool), 0,
            jnp.zeros((n,), bool),
        )
        mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
        sstate, mlp, losses = mapping_fn(
            sstate, mlp, pool, travel, 0, 1e9, jax.random.PRNGKey(2), 5, 1.0
        )
        return sstate, mlp, np.asarray(losses)

    st_r, mlp_r, l_r = run(False)
    st_s, mlp_s, l_s = run(True)
    np.testing.assert_allclose(l_s, l_r, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_s.geo_feats), np.asarray(st_r.geo_feats),
        rtol=2e-3, atol=2e-4,
    )
    for a, b in zip(jax.tree.leaves(mlp_s), jax.tree.leaves(mlp_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(st_s.certainty), np.asarray(st_r.certainty),
        rtol=2e-3, atol=2e-3,
    )
