"""End-to-end mapping slice test (SURVEY.md §7.2 M2): sampler → labels →
map update → BCE+eikonal training loop → SDF evaluation on a tiny
synthetic scene with a known pose. Exercises every layer except tracking.
"""

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.mapping import mapper as mp
from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.mapping.sampler import sample_rays
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.models import local_map as lm
from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import neighbor_offsets

RES = 0.3
LOCAL_RES = 0.1
F = 8
KNN = 6


def make_scene(rng):
    """Sensor at origin inside a 4m-radius cylinder wall (z in [-1,1])."""
    n = 512
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    r = 4.0
    pts = np.stack([r * np.cos(ang), r * np.sin(ang), z], -1).astype(np.float32)
    return pts


def test_mapping_convergence(rng):
    pts = make_scene(rng)
    n = pts.shape[0]
    pose = jnp.eye(4)
    mask = jnp.ones((n,), bool)

    # local raw-point map for labels
    lmap = lm.init_local_map(1 << 13, 1 << 15)
    lmap = lm.update_local_map(
        lmap, jnp.zeros(3), jnp.asarray(pts), mask, LOCAL_RES, 100.0
    )

    # training samples
    key = jax.random.PRNGKey(0)
    batch = sample_rays(
        key,
        jnp.asarray(pts),
        mask,
        pose,
        lmap,
        LOCAL_RES,
        surface_sample_range_m=0.25,
        surface_sample_n=3,
        free_front_n=2,
        free_behind_n=1,
        free_sample_begin_ratio=0.3,
        free_sample_end_dist_m=1.0,
        max_range=60.0,
    )
    assert bool(batch.mask.any())
    # labels near surface should be small, freespace positive & large
    lbl = np.asarray(batch.sdf_label)
    msk = np.asarray(batch.mask)
    w = np.asarray(batch.weight)
    free_front = msk & (w < 0) & (lbl > 0)
    assert free_front.sum() > n  # front freespace samples exist

    # neural map from near-surface samples (|label| < range*ratio)
    nmap = nm.init_map(1 << 13, 1 << 15, F)
    upd_sel = batch.mask & (jnp.abs(batch.sdf_label) < 0.25 * 0.5)
    travel = jnp.zeros((8,), jnp.float32)
    nmap, ratio = nm.insert_points(
        nmap, batch.coords, upd_sel, RES, travel, 0, 1e9
    )
    assert int(nmap.count) > 100

    # replay pool (coords already global: pose = I)
    pool = pl.init_pool(1 << 15, 1 << 15)
    pool = pl.append_samples(
        pool,
        batch.coords,
        batch.sdf_label,
        batch.weight,
        batch.mask,
        0,
        jnp.zeros_like(batch.mask),
    )
    assert int(pool.size) > 0

    # decoder + training
    mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 64, 1)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    sdf_scale = 0.55 * 0.1
    mapping = mp.make_mapping_fn(
        feature_dim=F,
        knn_k=KNN,
        nb_offs=nb,
        resolution=RES,
        max_valid_dist2=mvd2,
        sdf_scale=sdf_scale,
        sigma=sdf_scale,
        bs=1024,
        bs_new=0,
        gradient_decimation=10,
        num_grad_eps=RES * 0.2,
        weight_e=0.5,
        loss_weight_on=True,
        lr=0.01,
        adam_eps=1e-15,
    )
    color_mlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
    sem_mlp = dec.init_mlp(jax.random.PRNGKey(4), F + 3, 32, 1)
    nmap, mlp, _, _, losses = mapping(
        nmap, mlp, color_mlp, sem_mlp, pool, travel, 0, 1e9,
        jax.random.PRNGKey(2), 300, 1.0,
    )
    sdf_loss, eik_loss = float(losses[0]), float(losses[1])
    assert np.isfinite(sdf_loss) and np.isfinite(eik_loss)

    # evaluate: SDF ~ 0 on the wall, positive inside (sensor side),
    # negative behind
    def eval_sdf(q):
        r = nm.query_feature(nmap, jnp.asarray(q), nb, RES, mvd2, KNN)
        return np.asarray(dec.sdf(mlp, r.feature, sdf_scale)), np.asarray(
            r.nn_count
        )

    ang = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    on_wall = np.stack(
        [4.0 * np.cos(ang), 4.0 * np.sin(ang), np.zeros(50)], -1
    ).astype(np.float32)
    inside = on_wall * (3.6 / 4.0)  # 0.4 m in front of the wall
    s_wall, c_wall = eval_sdf(on_wall)
    s_in, c_in = eval_sdf(inside)
    ok = (c_wall >= 3) & (c_in >= 3)
    assert ok.sum() > 25
    # on-wall |sdf| small, inside clearly positive
    assert np.abs(s_wall[ok]).mean() < 0.15
    assert (s_in[ok] > 0.05).mean() > 0.75
    assert s_in[ok].mean() > 0.08
    assert s_in[ok].mean() > np.abs(s_wall[ok]).mean()


def test_pool_filter_and_append(rng):
    c = rng.uniform(-1, 1, (100, 3)).astype(np.float32)

    def fresh():
        return pl.append_samples(
            pl.init_pool(256, 64),
            jnp.asarray(c),
            jnp.zeros(100),
            jnp.ones(100),
            jnp.ones(100, bool),
            0,
            jnp.zeros(100, bool),
        )

    pool = fresh()
    assert int(pool.size) == 100
    assert int(pool.valid.sum()) == 100
    # filter_pool donates its input — build a fresh pool per call.
    # Filtering is mask-only: size stays (high-water mark), valid drops.
    pool2 = pl.filter_pool(fresh(), jnp.full((3,), 100.0), 5.0)
    assert int(pool2.valid.sum()) == 0
    pool3 = pl.filter_pool(fresh(), jnp.zeros(3), 10.0)
    assert int(pool3.valid.sum()) == 100
    # filtered-out rows must not contribute to training batches: they are
    # gated by the valid mask at sampling time
    idx = pl.sample_batch_indices(pool2, jax.random.PRNGKey(0), 16, 0)
    bvalid = np.asarray(pool2.valid[idx] & (idx < pool2.size))
    assert not bvalid.any()


def test_pool_overflow_drops_new(rng):
    pool = pl.init_pool(64, 16)
    c = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pool = pl.append_samples(
        pool,
        jnp.asarray(c),
        jnp.zeros(100),
        jnp.ones(100),
        jnp.ones(100, bool),
        0,
        jnp.zeros(100, bool),
    )
    assert int(pool.size) == 64  # capped


def test_pool_new_sample_mixing(rng):
    pool = pl.init_pool(256, 64)
    c = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    is_new = np.zeros(100, bool)
    is_new[:10] = True
    pool = pl.append_samples(
        pool,
        jnp.asarray(c),
        jnp.zeros(100),
        jnp.ones(100),
        jnp.ones(100, bool),
        0,
        jnp.asarray(is_new),
    )
    assert int(pool.new_count) == 10
    idx = np.asarray(
        pl.sample_batch_indices(pool, jax.random.PRNGKey(0), 32, 8)
    )
    # last 8 must come from the new buffer (indices < 10 here)
    assert (idx[-8:] < 10).all()


def test_slab_gather_sorted_vjp_matches_plain_gather():
    """The sorted-transpose slab gather must be value- and
    gradient-identical to plain indexing."""
    import numpy as np
    from clid_slam_tpu.mapping.mapper import _slab_gather_sorted

    rng = np.random.default_rng(0)
    W, B, K, F = 128, 64, 6, 8
    slab = jnp.asarray(rng.normal(size=(W, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, W, size=(B, K)).astype(np.int32))
    flat = idx.reshape(-1)
    order = jnp.argsort(flat)
    sorted_idx = flat[order]
    cot = jnp.asarray(rng.normal(size=(B, K, F)).astype(np.float32))

    def f_sorted(s):
        return jnp.sum(_slab_gather_sorted(s, idx, order, sorted_idx) * cot)

    def f_plain(s):
        return jnp.sum(s[idx] * cot)

    np.testing.assert_allclose(f_sorted(slab), f_plain(slab), rtol=1e-6)
    g1 = jax.grad(f_sorted)(slab)
    g2 = jax.grad(f_plain)(slab)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
