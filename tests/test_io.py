import numpy as np

from clid_slam_tpu.utils import io


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, 100).astype(np.float32)
    ts = rng.uniform(0, 0.1, 100).astype(np.float32)
    p = str(tmp_path / "scan.ply")
    io.write_ply(p, pts, extra={"intensity": inten, "timestamp": ts})
    out, out_ts = io.read_point_cloud(p, color_channel=1)
    np.testing.assert_allclose(out[:, :3], pts, rtol=1e-6)
    np.testing.assert_allclose(out[:, 3], inten, rtol=1e-6)
    np.testing.assert_allclose(out_ts, ts, rtol=1e-6)


def test_kitti_bin_read(tmp_path, rng):
    data = rng.uniform(-5, 5, (50, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    data.tofile(p)
    pts, ts = io.read_point_cloud(p, color_channel=0)
    assert ts is None
    np.testing.assert_allclose(pts, data[:, :3])


def test_kitti_pose_roundtrip(tmp_path, rng):
    n = 12
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.uniform(-5, 5, (n, 3))
    p = str(tmp_path / "poses.txt")
    io.write_kitti_poses(p, poses)
    out = io.read_kitti_poses(p)
    np.testing.assert_allclose(out, poses, atol=1e-8)


def test_tum_pose_roundtrip(tmp_path, rng):
    from clid_slam_tpu.odometry.iekf import _so3_exp

    n = 8
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        poses[i, :3, :3] = _so3_exp(rng.normal(size=3))
        poses[i, :3, 3] = rng.uniform(-2, 2, 3)
    p = str(tmp_path / "traj.txt")
    io.write_tum_poses(p, poses, np.arange(n, dtype=float))
    out, ts = io.read_tum_poses(p)
    np.testing.assert_allclose(out, poses, atol=1e-6)
    np.testing.assert_allclose(ts, np.arange(n), atol=1e-9)


def test_imu_csv(tmp_path):
    p = str(tmp_path / "1.csv")
    with open(p, "w") as f:
        f.write("dt,ax,ay,az,gx,gy,gz\n")
        f.write("0.01,0.1,0.2,9.8,0.01,0.02,0.03\n")
        f.write("0.01,0.0,0.0,9.81,0.0,0.0,0.0\n")
    rows = io.read_imu_csv(p)
    assert rows.shape == (2, 7)
    assert rows[0, 0] == 0.01
    assert rows[1, 3] == 9.81


def test_mesh_ply_write(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    t = np.array([[0, 1, 2]])
    p = str(tmp_path / "mesh.ply")
    io.write_ply_mesh(p, v, t)
    d = io.read_ply(p)
    np.testing.assert_allclose(
        np.stack([d["x"], d["y"], d["z"]], -1), v, atol=1e-7
    )
