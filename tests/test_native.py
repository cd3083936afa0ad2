"""Native C++ host runtime: parsers vs the pure-numpy readers, voxel
downsample vs ops/voxel semantics, and the prefetching loader."""

import os

import numpy as np
import pytest

from clid_slam_tpu import native
from clid_slam_tpu.utils import io

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native lib unavailable: {native.why_unavailable()}",
)


def _write_frames(tmp_path, rng, n_frames=3, n=500):
    paths = []
    for i in range(n_frames):
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 10
        inten = rng.uniform(0, 1, n).astype(np.float32)
        ts = np.linspace(0, 0.1, n)
        p = str(tmp_path / f"{i:06d}.ply")
        io.write_ply(
            p, pts, extra={"intensity": inten, "timestamp": ts}
        )
        paths.append(p)
    return paths


def test_ply_binary_matches_python(tmp_path, rng):
    p = _write_frames(tmp_path, rng, n_frames=1)[0]
    for cc in (0, 1):
        ref_pts, ref_ts = io.read_point_cloud(p, cc, use_native=False)
        got_pts, got_ts = native.read_point_cloud(p, cc)
        np.testing.assert_array_equal(got_pts, ref_pts)
        # writer stores timestamps as float32; both readers upcast
        np.testing.assert_allclose(got_ts, ref_ts, rtol=0, atol=0)


def test_ply_rgb_and_nonfinite_filtering(tmp_path, rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    pts[5, 0] = np.nan
    pts[17, 2] = np.inf
    colors = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.ply")
    io.write_ply(p, pts, colors=colors)
    ref_pts, _ = io.read_point_cloud(p, 3, use_native=False)
    got_pts, _ = native.read_point_cloud(p, 3)
    assert got_pts.shape == ref_pts.shape == (62, 6)
    np.testing.assert_array_equal(got_pts, ref_pts)


def test_ascii_ply_matches_python(tmp_path, rng):
    pts = rng.normal(size=(32, 3))
    body = "".join(f"{x:.6f} {y:.6f} {z:.6f}\n" for x, y, z in pts)
    p = str(tmp_path / "a.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 32\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n" + body
        )
    ref_pts, _ = io.read_point_cloud(p, 0, use_native=False)
    got_pts, _ = native.read_point_cloud(p, 0)
    np.testing.assert_allclose(got_pts, ref_pts, atol=1e-6)


def test_kitti_bin_matches_python(tmp_path, rng):
    data = rng.normal(size=(128, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    data.tofile(p)
    ref_pts, ref_ts = io.read_point_cloud(p, 1, use_native=False)
    got_pts, got_ts = native.read_point_cloud(p, 1)
    np.testing.assert_array_equal(got_pts, ref_pts)
    assert ref_ts is None and got_ts is None
    got0, _ = native.read_point_cloud(p, 0)
    assert got0.shape == (128, 3)


def test_pcd_binary_matches_python(tmp_path, rng):
    n = 100
    rec = np.zeros(
        n, dtype=np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("intensity", "<f4")])
    )
    for k in rec.dtype.names:
        rec[k] = rng.normal(size=n).astype(np.float32)
    p = str(tmp_path / "f.pcd")
    with open(p, "wb") as f:
        f.write(
            b"# .PCD v0.7\nVERSION 0.7\nFIELDS x y z intensity\n"
            b"SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
            + f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\nDATA binary\n".encode()
        )
        f.write(rec.tobytes())
    ref_pts, _ = io.read_point_cloud(p, 1, use_native=False)
    got_pts, _ = native.read_point_cloud(p, 1)
    np.testing.assert_array_equal(got_pts, ref_pts)


def test_voxel_downsample_matches_jax(rng):
    import jax.numpy as jnp

    from clid_slam_tpu.ops.voxel import voxel_down_sample_mask

    pts = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    mask = rng.uniform(size=4096) > 0.1
    res, table = 0.5, 1 << 15
    want = np.asarray(
        voxel_down_sample_mask(jnp.asarray(pts), jnp.asarray(mask), res, table)
    )
    got = native.voxel_downsample_mask(pts, res, table, mask)
    # identical hash + packed-key selection; only f32 rounding at voxel
    # boundaries could differ, and these random points avoid exact edges
    assert (got == want).mean() > 0.999
    assert abs(got.sum() - want.sum()) <= int(0.001 * want.sum()) + 1
    # per-voxel uniqueness of the native result
    g = np.floor(pts[got] / res).astype(np.int64)
    keys = {tuple(v) for v in g}
    assert len(keys) == got.sum()
    assert not got[~mask].any()


def test_prefetcher_matches_sync_reads(tmp_path, rng):
    paths = _write_frames(tmp_path, rng, n_frames=5)
    pf = native.FramePrefetcher(paths, lookahead=2, threads=2,
                                color_channel=1)
    try:
        for i in range(5):
            got_pts, got_ts = pf.get(i)
            ref_pts, ref_ts = io.read_point_cloud(paths[i], 1,
                                                  use_native=False)
            np.testing.assert_array_equal(got_pts, ref_pts)
            np.testing.assert_array_equal(got_ts, ref_ts)
    finally:
        pf.close()


def test_prefetcher_out_of_order_and_errors(tmp_path, rng):
    paths = _write_frames(tmp_path, rng, n_frames=4)
    bad = str(tmp_path / "missing.ply")
    pf = native.FramePrefetcher(paths + [bad], lookahead=8, threads=2)
    try:
        p3, _ = pf.get(3)
        p0, _ = pf.get(0)
        assert p3.shape == p0.shape == (500, 3)
        with pytest.raises(ValueError):
            pf.get(4)
    finally:
        pf.close()


def test_dataset_uses_prefetcher(tmp_path, rng):
    from clid_slam_tpu.config import Config
    from clid_slam_tpu.pipeline.dataset import SLAMDataset

    _write_frames(tmp_path, rng, n_frames=3)
    cfg = Config()
    cfg.pc_path = str(tmp_path)
    cfg.deskew = False
    ds = SLAMDataset(cfg)
    assert ds.total_pc_count == 3
    ds.read_frame(0)
    assert ds._prefetcher is not None
    assert ds._raw_points.shape[0] == 500
