"""Regression test for the offline map inspector CLI: it must load the
engine's .npz checkpoint format (all NeuralMapState fields, incl. ones
added later like color_feats) and export artifacts."""

import numpy as np

from clid_slam_tpu.tools import inspect_map


def test_inspect_map_loads_checkpoint(tmp_path, rng):
    cap, hsize, f = 64, 256, 8
    n = 32
    pos = np.zeros((cap + 1, 3), np.float32)
    pos[:n] = rng.normal(size=(n, 3)).astype(np.float32)
    np.savez(
        tmp_path / "ckpt.npz",
        positions=pos,
        quats=np.tile(np.array([1, 0, 0, 0], np.float32), (cap + 1, 1)),
        geo_feats=rng.normal(size=(cap + 1, f)).astype(np.float32),
        color_feats=np.zeros((cap + 1, 1), np.float32),
        certainty=np.ones(cap + 1, np.float32),
        ts_create=np.zeros(cap + 1, np.int32),
        ts_update=np.zeros(cap + 1, np.int32),
        count=np.asarray(n, np.int32),
        hash_table=np.full(hsize, -1, np.int32),
        hash_mirror=np.full((hsize, 4), 1e9, np.float32),
        mlp_weights=rng.normal(size=(11, 64)).astype(np.float32),
        mlp_biases=np.zeros((64,), np.float32),
        mlp_w_out=rng.normal(size=(64, 1)).astype(np.float32),
        mlp_b_out=np.zeros((1,), np.float32),
    )
    inspect_map.main([str(tmp_path / "ckpt.npz"), "-o", str(tmp_path)])
    assert (tmp_path / "neural_points.ply").exists()
