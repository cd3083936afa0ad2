"""Format-conversion CLI (tools/convert.py — reference tools.ipynb)."""

import numpy as np

from clid_slam_tpu.tools import convert
from clid_slam_tpu.utils import io


def test_pose_csv_to_tum(tmp_path):
    src = tmp_path / "gt.csv"
    rows = ["nsec,x,y,z,qx,qy,qz,qw"]
    rows.append("1000000000,1.0,2.0,3.0,0,0,0,1")
    rows.append("2000000000,4.0,5.0,6.0,0,0,0,1")
    src.write_text("\n".join(rows) + "\n")
    dst = tmp_path / "gt_tum.txt"
    n = convert.pose_csv_to_tum(str(src), str(dst))
    assert n == 2
    poses, ts = io.read_tum_poses(str(dst))
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[0][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(ts, [1.0, 2.0])


def test_pose_roundtrip_kitti_tum(tmp_path):
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(5, 3))
    k = tmp_path / "k.txt"
    t = tmp_path / "t.txt"
    io.write_kitti_poses(str(k), poses)
    convert.main(["pose-kitti-to-tum", str(k), str(t)])
    k2 = tmp_path / "k2.txt"
    convert.main(["pose-tum-to-kitti", str(t), str(k2)])
    back = io.read_kitti_poses(str(k2))
    np.testing.assert_allclose(back, poses, atol=1e-5)


def test_mesh_transform(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int64)
    src = tmp_path / "m.ply"
    io.write_ply_mesh(str(src), v, tris)
    dst = tmp_path / "m2.ply"
    T = np.eye(4)
    T[:3, 3] = [10, 0, 0]
    nv, nt = convert.mesh_transform(str(src), str(dst), T)
    assert (nv, nt) == (3, 1)
    v2, t2, _ = convert._read_mesh_ply(str(dst))
    np.testing.assert_allclose(v2[:, 0], v[:, 0] + 10, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)
