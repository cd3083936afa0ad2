"""Positional encoders (reference model/neural_points.py:1095-1160) and
their wiring into the map query / decoder input dims."""

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.config import Config
from clid_slam_tpu.ops import encoding as enc


def _reference_positional(x, bands, freq, base, input_dim=3):
    """Numpy transliteration of PositionalEncoder.forward
    (model/neural_points.py:1109-1133) semantics."""
    x = np.asarray(x, np.float64)[..., :input_dim, None]
    stop = np.log(freq / 2) / np.log(base)
    scales = np.logspace(0.0, stop, bands, base=base)
    xs = x * scales * np.pi
    out = np.concatenate([np.sin(xs), np.cos(xs), x], axis=-1)
    return out.reshape(*out.shape[:-2], -1)


def test_positional_encode_matches_reference(rng):
    x = rng.normal(size=(64, 6, 3)).astype(np.float32)
    scales = enc.positional_scales(4, 200.0, 2.0)
    got = np.asarray(enc.positional_encode(jnp.asarray(x), scales))
    want = _reference_positional(x, 4, 200.0, 2.0)
    assert got.shape == (64, 6, 3 * (2 * 4 + 1))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gaussian_fourier_shapes_and_determinism(rng):
    x = rng.normal(size=(32, 3)).astype(np.float32)
    f1, d1 = enc.make_encoder(
        num_bands=8, freq=10.0, base=2.0, use_gaussian=True, seed=7
    )
    f2, d2 = enc.make_encoder(
        num_bands=8, freq=10.0, base=2.0, use_gaussian=True, seed=7
    )
    assert d1 == d2 == 3 + 16
    a, b = np.asarray(f1(jnp.asarray(x))), np.asarray(f2(jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)
    # first 3 columns are the raw input (model/neural_points.py:1158)
    np.testing.assert_allclose(a[:, :3], x, atol=1e-6)


def test_band_zero_disables_encoding():
    fn, dim = enc.make_encoder(
        num_bands=0, freq=200.0, base=2.0, use_gaussian=False
    )
    assert fn is None and dim == 3
    c = Config()
    assert c.position_dim == 3
    c.pos_encoding_band = 4
    assert c.position_dim == 3 * 9
    c.use_gaussian_pe = True
    assert c.position_dim == 3 + 8


def test_query_feature_with_encoding(rng):
    """Encoded query: feature width F + P, invalid neighbors contribute 0,
    and gradients flow to geo_feats."""
    from clid_slam_tpu.models import neural_map as nm
    from clid_slam_tpu.ops.voxel import neighbor_offsets

    res, F, k = 0.3, 8, 6
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * res) ** 2
    st = nm.init_map(1 << 10, 1 << 12, F)
    pts = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    st, _ = nm.insert_points(
        st, jnp.asarray(pts), jnp.ones((256,), bool), res,
        jnp.zeros((4,), jnp.float32), 0, 1e9,
    )
    st = st._replace(
        geo_feats=jnp.asarray(
            rng.normal(size=st.geo_feats.shape).astype(np.float32)
        )
    )
    fn, P = enc.make_encoder(
        num_bands=3, freq=200.0, base=2.0, use_gaussian=False
    )
    q = rng.uniform(-1.5, 1.5, size=(64, 3)).astype(np.float32)

    def loss(feats):
        r = nm.query_feature(
            st._replace(geo_feats=feats), jnp.asarray(q), nb, res, mvd2, k,
            encode_vecs=fn,
        )
        assert r.feature.shape == (64, F + P)
        return jnp.sum(r.feature ** 2), r

    (val, r), g = jax.value_and_grad(loss, has_aux=True)(st.geo_feats)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    # rows with zero neighbors produce an all-zero feature even though
    # encode(0) has cos(0)=1 components — the weight mask must kill them
    none = np.asarray(r.nn_count) == 0
    if none.any():
        np.testing.assert_allclose(
            np.asarray(r.feature)[none], 0.0, atol=1e-6
        )


def test_slam_loop_with_pe_learns():
    """3-frame mapping-only run with PE enabled: losses finite and
    decreasing; decoder dims line up end-to-end."""
    from clid_slam_tpu.pipeline.slam import SlamSystem
    from clid_slam_tpu.pipeline.synthetic import generate_sequence
    from tests.test_slam_integration import tiny_config

    cfg = tiny_config(track_on=False)
    cfg.pos_encoding_band = 2
    cfg.pos_encoding_freq = 20.0
    n = 4
    seq = generate_sequence(
        n_frames=n, n_azimuth=128, n_elev=12, noise_std=0.005, seed=5
    )
    system = SlamSystem(cfg, total_frames=n)
    system.dataset.gt_poses = seq.poses
    for i in range(n):
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        assert np.isfinite(st.sdf_loss)
    # sdf_loss is the LAST-iteration loss of each frame's online training;
    # new data arrives every frame so per-frame values are noisy — require
    # only that some later frame improves on the warm-up frame (the online
    # loop is chaotically sensitive; see STATUS.md numerics notes)
    later = min(s.sdf_loss for s in system.stats[1:])
    assert later < system.stats[0].sdf_loss
