"""Regression tests for round-4 fixes (VERDICT r3 items)."""

import numpy as np

from clid_slam_tpu.utils.transforms import adaptive_crop_range


def _surround_scan(rng, n=4096, radius=30.0):
    """Surround (360°) scan: returns at ~radius in every azimuth, so every
    coordinate axis spans [-radius, +radius] and the min |coordinate| is ~0."""
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.3, 0.05, n)
    r = rng.uniform(2.0, radius, n)
    pts = np.stack(
        [
            r * np.cos(el) * np.cos(az),
            r * np.cos(el) * np.sin(az),
            r * np.sin(el),
        ],
        axis=1,
    ).astype(np.float32)
    return pts


def test_adaptive_range_keeps_surround_scan():
    """VERDICT r3 weak #3: `np.abs(pts).min(0)` collapsed the crop radius to
    ~0 for surround scans, discarding nearly every point. The fix takes the
    |per-axis bound| (ref utils/slam_dataset.py:395-404)."""
    rng = np.random.default_rng(42)
    pts = _surround_scan(rng, radius=30.0)
    max_range = 60.0
    crop = adaptive_crop_range(pts, max_range)
    # inner bound ≈ 30 on both axes → crop ≈ min(60, 2*~29) ≈ 55+
    assert crop > 40.0, crop
    dist = np.linalg.norm(pts, axis=1)
    survive = (dist < crop).mean()
    assert survive > 0.9, f"only {survive:.1%} of points survive the crop"


def test_adaptive_range_shrinks_for_asymmetric_scan():
    """A forward-only scan (e.g. corridor with the rear blocked) should crop
    to twice the smaller symmetric extent, as the reference does."""
    rng = np.random.default_rng(0)
    pts = _surround_scan(rng, radius=50.0)
    # Block everything behind x < -5: the -x bound shrinks to ~5.
    pts = pts[pts[:, 0] > -5.0]
    crop = adaptive_crop_range(pts, 100.0)
    # min(|x_max|,|x_min|) ≈ 5; y stays ≈ 50 → inner ≈ 50, crop ≈ 100? No:
    # inner = max over axes, so the y symmetry keeps the crop wide. Block y too.
    pts2 = pts[pts[:, 1] > -5.0]
    crop2 = adaptive_crop_range(pts2, 100.0)
    assert crop2 < 15.0, crop2
    assert crop <= 100.0


def test_adaptive_range_cap():
    rng = np.random.default_rng(1)
    pts = _surround_scan(rng, radius=80.0)
    assert adaptive_crop_range(pts, 60.0) == 60.0


# ---- main-loss-type selector (VERDICT r3 missing #5) ----------------------


def _loss_inputs(n=257, seed=3):
    rng = np.random.default_rng(seed)
    pred = rng.normal(0, 0.3, n).astype(np.float32)
    label = rng.normal(0, 0.3, n).astype(np.float32)
    weight = rng.uniform(0.2, 2.0, n).astype(np.float32) * np.where(
        rng.uniform(size=n) < 0.5, 1, -1
    )
    bvalid = (rng.uniform(size=n) < 0.8).astype(np.float32)
    return pred, label, weight, bvalid


def test_sdf_loss_types_match_reference_formulas():
    """make_sdf_loss implements ref utils/loss.py:9-83 semantics with
    live-row masking (fixed-capacity batches carry dead padding rows)."""
    from clid_slam_tpu.mapping.mapper import make_sdf_loss

    pred, label, weight, bvalid = _loss_inputs()
    sigma = 0.055
    denom = bvalid.sum()
    w_abs = np.abs(weight) * bvalid

    def got(loss_type, weighted=True):
        return float(
            make_sdf_loss(
                label, weight, bvalid,
                loss_type=loss_type, sigma=sigma, loss_weight_on=weighted,
            )(pred)
        )

    # bce (loss.py:44-63)
    z = pred / sigma
    t = 1.0 / (1.0 + np.exp(-label / sigma))
    bce = np.maximum(z, 0) - z * t + np.log1p(np.exp(-np.abs(z)))
    np.testing.assert_allclose(got("bce"), (w_abs * bce).sum() / denom, rtol=1e-5)
    np.testing.assert_allclose(
        got("bce", False), (bvalid * bce).sum() / denom, rtol=1e-5
    )

    # zhong (loss.py:66-83, trunc_dist=None as the ref mapper passes)
    mid = label / 2.0
    zh = np.maximum(np.abs(pred - mid) - np.abs(mid), 0.0)
    np.testing.assert_allclose(got("zhong"), (w_abs * zh).sum() / denom, rtol=1e-5)
    np.testing.assert_allclose(
        got("zhong", False), (bvalid * zh).sum() / denom, rtol=1e-5
    )

    # sdf_l1 / sdf_l2 (loss.py:9-17 — always weighted)
    l1 = np.abs(pred - label)
    l2 = (pred - label) ** 2
    for weighted in (True, False):
        np.testing.assert_allclose(
            got("sdf_l1", weighted), (w_abs * l1).sum() / denom, rtol=1e-5
        )
        np.testing.assert_allclose(
            got("sdf_l2", weighted), (w_abs * l2).sum() / denom, rtol=1e-5
        )


def test_unknown_loss_type_raises():
    import pytest

    from clid_slam_tpu.config import Config
    from clid_slam_tpu.mapping.mapper import make_sdf_loss

    pred, label, weight, bvalid = _loss_inputs(16)
    with pytest.raises(ValueError, match="main_loss_type"):
        make_sdf_loss(
            label, weight, bvalid,
            loss_type="ranger", sigma=0.05, loss_weight_on=True,
        )

    with pytest.raises(ValueError, match="main_loss_type"):
        Config.from_dict({"loss": {"main_loss_type": "ranger"}})


def test_moment_io_gating_matches_ungated_with_multiple_outer_batches():
    """ADVICE r3: the gated Adam-moment slab IO (skip all-zero first-batch
    gather, skip dead last-batch write-back) must match the always-gather/
    always-write path for n_outer >= 2 — the invariant couples two lax.cond
    sites."""
    import jax
    import jax.numpy as jnp

    from clid_slam_tpu.mapping import mapper as mp
    from clid_slam_tpu.mapping import pool as pl
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.ops.voxel import neighbor_offsets

    rng = np.random.default_rng(7)
    pts = _surround_scan(rng, n=1024, radius=4.0)
    F, KNN, RES = 8, 6, 0.3
    travel = jnp.zeros((8,), jnp.float32)
    lbl = rng.normal(0, 0.1, 1024).astype(np.float32)
    wgt = np.ones(1024, np.float32)
    nb = neighbor_offsets(2, 0.5)

    def run(gate):
        nmap = nm.init_map(1 << 11, 1 << 13, F)
        nmap, _ = nm.insert_points(
            nmap, jnp.asarray(pts), jnp.ones((1024,), bool), RES, travel, 0, 1e9
        )
        pool = pl.init_pool(1 << 13, 1 << 13)
        pool = pl.append_samples(
            pool, jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(wgt),
            jnp.ones((1024,), bool), 0, jnp.zeros((1024,), bool),
        )
        mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 32, 1)
        cmlp = dec.init_mlp(jax.random.PRNGKey(2), F + 3, 32, 1)
        smlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
        mapping = mp.make_mapping_fn(
            feature_dim=F, knn_k=KNN, nb_offs=nb, resolution=RES,
            max_valid_dist2=3.0 * (3 * RES) ** 2,
            sdf_scale=0.055, sigma=0.055,
            bs=256, bs_new=0, gradient_decimation=8,
            num_grad_eps=RES * 0.2, weight_e=0.5, loss_weight_on=True,
            lr=0.01, adam_eps=1e-15,
            resample_every=4,  # iter_count=11 -> n_outer=3 (4+4+3)
            gate_moment_io=gate,
        )
        st, mlp, _, _, losses = mapping(
            nmap, mlp, cmlp, smlp, pool, travel, 0, 1e9,
            jax.random.PRNGKey(4), 11, 1.0,
        )
        return np.asarray(st.geo_feats), jax.tree.map(np.asarray, mlp), losses

    feats_g, mlp_g, loss_g = run(True)
    feats_u, mlp_u, loss_u = run(False)
    np.testing.assert_array_equal(feats_g, feats_u)
    for a, b in zip(jax.tree.leaves(mlp_g), jax.tree.leaves(mlp_u)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(loss_g), np.asarray(loss_u))


def test_single_batch_mapping_matches_general_path():
    """max_outer=1 (static single-batch, no full-capacity moment slabs)
    must be bit-equal to the general dynamic-outer path whenever
    iter_count <= resample_every (the steady-state regime the streaming
    loop runs it in)."""
    import jax
    import jax.numpy as jnp

    from clid_slam_tpu.mapping import mapper as mp
    from clid_slam_tpu.mapping import pool as pl
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.ops.voxel import neighbor_offsets

    rng = np.random.default_rng(5)
    pts = _surround_scan(rng, n=1024, radius=4.0)
    F, KNN, RES = 8, 6, 0.3
    travel = jnp.zeros((8,), jnp.float32)
    lbl = rng.normal(0, 0.1, 1024).astype(np.float32)
    wgt = np.ones(1024, np.float32)
    nb = neighbor_offsets(2, 0.5)

    def run(max_outer):
        nmap = nm.init_map(1 << 11, 1 << 13, F)
        nmap, _ = nm.insert_points(
            nmap, jnp.asarray(pts), jnp.ones((1024,), bool), RES, travel, 0, 1e9
        )
        pool = pl.init_pool(1 << 13, 1 << 13)
        pool = pl.append_samples(
            pool, jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(wgt),
            jnp.ones((1024,), bool), 0, jnp.zeros((1024,), bool),
        )
        mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 32, 1)
        cmlp = dec.init_mlp(jax.random.PRNGKey(2), F + 3, 32, 1)
        smlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
        mapping = mp.make_mapping_fn(
            feature_dim=F, knn_k=KNN, nb_offs=nb, resolution=RES,
            max_valid_dist2=3.0 * (3 * RES) ** 2,
            sdf_scale=0.055, sigma=0.055,
            bs=256, bs_new=0, gradient_decimation=8,
            num_grad_eps=RES * 0.2, weight_e=0.5, loss_weight_on=True,
            lr=0.01, adam_eps=1e-15,
            resample_every=12, max_outer=max_outer,
        )
        st, mlp, _, _, losses = mapping(
            nmap, mlp, cmlp, smlp, pool, travel, 0, 1e9,
            jax.random.PRNGKey(4), 9, 1.0,
        )
        return (
            np.asarray(st.geo_feats),
            np.asarray(st.certainty),
            jax.tree.map(np.asarray, mlp),
            np.asarray(losses),
        )

    fg, cg, mg, lg = run(0)
    ff, cf, mf, lf = run(1)
    np.testing.assert_array_equal(fg, ff)
    np.testing.assert_array_equal(cg, cf)
    np.testing.assert_array_equal(lg, lf)
    for a, b in zip(jax.tree.leaves(mg), jax.tree.leaves(mf)):
        np.testing.assert_array_equal(a, b)


def test_mapping_runs_with_each_loss_type():
    """The cached production mapping path compiles + steps under every
    supported loss type (ref utils/mapper.py:750-766 switch)."""
    import jax
    import jax.numpy as jnp

    from clid_slam_tpu.mapping import mapper as mp
    from clid_slam_tpu.mapping import pool as pl
    from clid_slam_tpu.models import decoder as dec
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.ops.voxel import neighbor_offsets

    rng = np.random.default_rng(0)
    pts = _surround_scan(rng, n=1024, radius=4.0)
    F, KNN, RES = 8, 6, 0.3

    travel = jnp.zeros((8,), jnp.float32)
    lbl = rng.normal(0, 0.1, 1024).astype(np.float32)
    wgt = np.ones(1024, np.float32)
    nb = neighbor_offsets(2, 0.5)

    def fresh_state():
        # mapping donates its inputs, so rebuild per loss type
        nmap = nm.init_map(1 << 11, 1 << 13, F)
        nmap, _ = nm.insert_points(
            nmap, jnp.asarray(pts), jnp.ones((1024,), bool), RES, travel, 0, 1e9
        )
        pool = pl.init_pool(1 << 13, 1 << 13)
        pool = pl.append_samples(
            pool, jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(wgt),
            jnp.ones((1024,), bool), 0, jnp.zeros((1024,), bool),
        )
        mlp = dec.init_mlp(jax.random.PRNGKey(1), F + 3, 32, 1)
        cmlp = dec.init_mlp(jax.random.PRNGKey(2), F + 3, 32, 1)
        smlp = dec.init_mlp(jax.random.PRNGKey(3), F + 3, 32, 1)
        return nmap, pool, mlp, cmlp, smlp

    for lt in ("zhong", "sdf_l1", "sdf_l2"):
        nmap, pool, mlp, cmlp, smlp = fresh_state()
        mapping = mp.make_mapping_fn(
            feature_dim=F, knn_k=KNN, nb_offs=nb, resolution=RES,
            max_valid_dist2=3.0 * (3 * RES) ** 2,
            sdf_scale=1.0, sigma=1.0,  # non-bce: sdf_scale 1.0 (config _derive)
            bs=256, bs_new=0, gradient_decimation=8,
            num_grad_eps=RES * 0.2, weight_e=0.5, loss_weight_on=True,
            lr=0.01, adam_eps=1e-15, loss_type=lt,
        )
        _, _, _, _, losses = mapping(
            nmap, mlp, cmlp, smlp, pool, travel, 0, 1e9,
            jax.random.PRNGKey(4), 5, 1.0,
        )
        assert np.isfinite(float(losses[0])), lt
