"""Dataset name/sequence -> path wiring.

Equivalent of utils/dataset_indexing.py:9-117: given a dataset family name
and sequence id, rewrite the config's pc/pose/calib/label paths to the
conventional on-disk layout for the common benchmarks.
"""

from __future__ import annotations

import os

from ..config import Config


def set_dataset_path(cfg: Config, dataset_name: str = "", seq: str = ""):
    if not dataset_name:
        return cfg
    name = dataset_name.lower()
    root = cfg.pc_path or "."
    base = os.path.dirname(root.rstrip("/")) if root else "."

    if name == "kitti":
        seq = str(seq).zfill(2)
        cfg.name += f"_kitti_{seq}"
        cfg.pc_path = os.path.join(base, "sequences", seq, "velodyne")
        cfg.pose_path = os.path.join(base, "poses", seq + ".txt")
        cfg.calib_path = os.path.join(base, "sequences", seq, "calib.txt")
        cfg.label_path = os.path.join(base, "sequences", seq, "labels")
        cfg.kitti_correction_on = True
        cfg.correction_deg = 0.195
    elif name in ("ncd", "ncd128"):
        cfg.name += f"_ncd_{seq}"
        cfg.pc_path = os.path.join(base, seq, "sequences", "lidar")
        cfg.imu_path = os.path.join(base, seq, "sequences", "imu")
        cfg.pose_ts_path = os.path.join(base, seq, "sequences", "pose_ts.txt")
        gt = os.path.join(base, seq, "sequences", "gt_poses.txt")
        if os.path.isfile(gt):
            cfg.pose_path = gt
    elif name == "mulran":
        cfg.name += f"_mulran_{seq}"
        cfg.pc_path = os.path.join(base, seq, "Ouster")
        cfg.pose_path = os.path.join(base, seq, "global_pose.csv")
    elif name in ("m2dgr", "subt", "subt_mrs"):
        cfg.name += f"_{name}_{seq}"
        cfg.pc_path = os.path.join(base, seq, "sequences", "lidar")
        cfg.imu_path = os.path.join(base, seq, "sequences", "imu")
        cfg.pose_ts_path = os.path.join(base, seq, "sequences", "pose_ts.txt")
    elif name == "replica":
        cfg.name += f"_replica_{seq}"
        cfg.pc_path = os.path.join(base, seq, "rgbd_down_ply")
        cfg.pose_path = os.path.join(base, seq, "poses.txt")
    else:
        raise ValueError(f"unknown dataset family: {dataset_name}")
    return cfg
