import numpy as np
import jax.numpy as jnp

from clid_slam_tpu.ops import voxel


def brute_force_downsample(points, mask, res):
    """Reference semantics: per voxel keep point closest to voxel center."""
    keep = np.zeros(len(points), dtype=bool)
    vox = {}
    for i, p in enumerate(points):
        if not mask[i]:
            continue
        g = tuple(np.floor(p / res).astype(int))
        center = (np.array(g) + 0.5) * res
        d = np.sum((p - center) ** 2)
        if g not in vox or d < vox[g][0]:
            vox[g] = (d, i)
    for _, i in vox.values():
        keep[i] = True
    return keep


def test_voxel_down_sample_matches_bruteforce(rng):
    pts = rng.uniform(-5, 5, size=(512, 3)).astype(np.float32)
    mask = rng.uniform(size=512) > 0.1
    res = 0.7
    got = np.asarray(
        voxel.voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(mask), res, 1 << 14)
    )
    want = brute_force_downsample(pts, mask, res)
    # identical up to rare hash collisions; require >99% agreement and
    # exactly one survivor per occupied voxel
    assert (got == want).mean() > 0.99
    g = np.floor(pts[got] / res).astype(int)
    assert len(np.unique(g, axis=0)) == got.sum()


def test_voxel_down_sample_empty_mask():
    pts = np.zeros((16, 3), dtype=np.float32)
    mask = np.zeros(16, dtype=bool)
    got = np.asarray(
        voxel.voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(mask), 0.5, 256)
    )
    assert not got.any()


def test_voxel_down_sample_min_value(rng):
    pts = rng.uniform(-2, 2, size=(256, 3)).astype(np.float32)
    mask = np.ones(256, dtype=bool)
    value = rng.uniform(size=256).astype(np.float32)
    res = 1.0
    got = np.asarray(
        voxel.voxel_down_sample_min_value_mask(
            jnp.asarray(pts), jnp.asarray(mask), res, jnp.asarray(value), 1 << 12
        )
    )
    # each occupied voxel's survivor has that voxel's min value
    g = np.floor(pts / res).astype(int)
    voxids = {tuple(x) for x in g}
    hit = 0
    for v in voxids:
        sel = np.all(g == np.array(v), axis=1)
        winners = got & sel
        if winners.sum() == 1:
            assert value[winners][0] == value[sel].min()
            hit += 1
    assert hit / len(voxids) > 0.95


def test_neighbor_offsets_counts():
    # match the reference's documented K table (model/neural_points.py:955-965)
    assert voxel.neighbor_offsets(2, 0.2).shape[0] == 33
    assert voxel.neighbor_offsets(2, 0.3).shape[0] == 57
    assert voxel.neighbor_offsets(2, 0.5).shape[0] == 81
    assert voxel.neighbor_offsets(2, 1.0).shape[0] == 93
    assert voxel.neighbor_offsets(3, 0.2).shape[0] == 147


def test_voxel_hash_in_range(rng):
    coords = rng.integers(-1000, 1000, size=(1000, 3)).astype(np.int32)
    h = np.asarray(voxel.voxel_hash(jnp.asarray(coords), 1 << 10))
    assert (h >= 0).all() and (h < 1 << 10).all()
    # same coord -> same hash
    h2 = np.asarray(voxel.voxel_hash(jnp.asarray(coords), 1 << 10))
    assert (h == h2).all()
