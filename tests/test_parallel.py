"""Multi-chip data-parallel mapping over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets
from clid_slam_tpu.parallel.data_parallel import (
    make_dp_mapping_fn,
    make_mesh,
    shard_batch_pipeline,
)

RES = 0.3
F = 8


def _setup(rng):
    pts = rng.uniform(-3, 3, size=(2000, 3)).astype(np.float32)
    state = nm.init_map(1 << 13, 1 << 15, F)
    state, _ = nm.insert_points(
        state, jnp.asarray(pts), jnp.ones((2000,), bool), RES,
        jnp.zeros((8,), jnp.float32), 0, 1e9,
    )
    pool = pl.init_pool(8192, 512)
    m = 4096
    pool = pl.append_samples(
        pool,
        jnp.asarray(rng.uniform(-3, 3, (m, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, m).astype(np.float32)),
        jnp.ones((m,), jnp.float32),
        jnp.ones((m,), bool),
        0,
        jnp.zeros((m,), bool),
    )
    mlp = dec.init_mlp(jax.random.PRNGKey(0), F + 3, 64, 1)
    return state, pool, mlp


def test_dp_mapping_runs_on_mesh(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8)
    state, pool, mlp = _setup(rng)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    mapping = make_dp_mapping_fn(
        mesh,
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, sigma=0.055,
        bs=512, bs_new=0, gradient_decimation=8, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
    )
    travel = jnp.zeros((8,), jnp.float32)
    state2, mlp2, losses = mapping(
        state, mlp, pool, travel, 0, 1e9, jax.random.PRNGKey(1), 3, 1.0
    )
    assert np.isfinite(np.asarray(losses)).all()
    # features actually moved
    assert float(jnp.abs(state2.geo_feats).max()) > 0


def test_dp_matches_single_device_loss_scale(rng):
    """The sharded step must compute the same loss magnitude as the
    unsharded math (it is the same program, just partitioned)."""
    from clid_slam_tpu.mapping import mapper as mp

    state, pool, mlp = _setup(rng)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    kw = dict(
        feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
        max_valid_dist2=mvd2, sdf_scale=0.055, sigma=0.055,
        bs=512, bs_new=0, gradient_decimation=8, num_grad_eps=RES * 0.2,
        weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
    )
    mesh = make_mesh(8)
    dp = make_dp_mapping_fn(mesh, **kw)
    single = mp.make_mapping_fn(**kw)
    travel = jnp.zeros((8,), jnp.float32)
    color_mlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
    sem_mlp = dec.init_mlp(jax.random.PRNGKey(4), F + 3, 32, 1)

    import copy

    s1, _, l_dp = dp(
        copy.deepcopy(state), mlp, pool, travel, 0, 1e9,
        jax.random.PRNGKey(7), 2, 1.0,
    )
    s2, _, _, _, l_single = single(
        state, mlp, color_mlp, sem_mlp, pool, travel, 0, 1e9,
        jax.random.PRNGKey(7), 2, 1.0,
    )
    # same PRNG stream -> same batch multiset -> same losses, up to f32
    # association AND the single-device path's voxel-hash batch sort
    # (reorders summation and shifts which rows the eikonal decimation
    # samples — a different arbitrary subsample, not a different program)
    np.testing.assert_allclose(
        np.asarray(l_dp), np.asarray(l_single), rtol=5e-3, atol=1e-3
    )


def test_shard_batch_pipeline(rng):
    mesh = make_mesh(8)
    a = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(64,)).astype(np.float32))
    sa, sb = shard_batch_pipeline(mesh, [a, b])
    np.testing.assert_allclose(np.asarray(sa), np.asarray(a))
    assert len(sa.sharding.device_set) == 8
