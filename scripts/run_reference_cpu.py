#!/usr/bin/env python3
"""Run the REFERENCE CLID-SLAM (torch, CPU) side-by-side on the same
synthetic LiDAR-inertial sequence that bench.py uses, and report its ATE +
per-frame timing.

Why: the environment has no network access and no real benchmark sequences
(ncd128 / SubT-MRS), so trajectory-accuracy parity vs the reference is
established by running BOTH engines on an identical sequence (same scans,
same IMU windows, same seed, same workload parameters) and comparing ATE.
The reference's heavyweight deps (open3d / wandb / roma / natsort) are
replaced with minimal stubs — none of them participate in the compute path
of a headless run (open3d is I/O + vis containers, roma only deskews which
is off here, wandb is gated off by config).

The harness drives the reference's OWN modules (slam.py:43-230 loop
structure): SLAMDataset.read_frame/preprocess_frame (which runs
IEKFOM.predict per IMU row, utils/slam_dataset.py:380-393),
IEKFOM.update_iterated, Mapper.process_frame, Mapper.mapping — all
unmodified reference code imported from /root/reference.

Usage:
  PYTHONPATH=/root/repo python scripts/run_reference_cpu.py \
      [--frames 25] [--out /tmp/ref_cpu_run] [--iters-scale 1.0]

Prints one JSON line with ate_rmse_m and timing; artifacts in --out.
"""

import argparse
import json
import os
import re
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


# --------------------------------------------------------------- dep stubs
def _install_stubs():
    """Minimal stand-ins for reference deps absent in this env. They only
    need to satisfy module-level imports and a few container constructors
    never used for math in a headless run."""

    class _Anything:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return _Anything()

        def __getattr__(self, name):
            return _Anything()

    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")
        o3d.geometry = _Anything()
        o3d.utility = _Anything()
        o3d.core = _Anything()
        o3d.io = _Anything()
        o3d.t = _Anything()
        o3d.visualization = _Anything()
        sys.modules["open3d"] = o3d

    if "wandb" not in sys.modules:
        wandb = types.ModuleType("wandb")
        wandb.init = lambda *a, **k: None
        wandb.log = lambda *a, **k: None
        sys.modules["wandb"] = wandb

    if "roma" not in sys.modules:
        roma = types.ModuleType("roma")

        def _unused(*a, **k):
            raise NotImplementedError("roma stub: deskew must be off")

        roma.rotmat_slerp = _unused
        sys.modules["roma"] = roma

    if "natsort" not in sys.modules:
        natsort = types.ModuleType("natsort")

        def natsorted(seq):
            def key(s):
                return [
                    int(t) if t.isdigit() else t
                    for t in re.split(r"(\d+)", str(s))
                ]

            return sorted(seq, key=key)

        natsort.natsorted = natsorted
        sys.modules["natsort"] = natsort


# ------------------------------------------------------------ dataset dump
def dump_reference_dataset(seq, root: str) -> dict:
    """Write the synthetic sequence in the layout the reference's generic
    loader expects: lidar/*.bin (KITTI float32 x,y,z,i — parsed with pure
    numpy, utils/slam_dataset.py:997-1010), imu/{i}.csv in the converter
    format (header + rows; a sacrificial dt=0 first row compensates
    pandas' skiprows=1 + header inference consuming one row,
    utils/slam_dataset.py:384), gt poses in KITTI format."""
    lidar_dir = os.path.join(root, "lidar")
    imu_dir = os.path.join(root, "imu")
    os.makedirs(lidar_dir, exist_ok=True)
    os.makedirs(imu_dir, exist_ok=True)
    for i, scan in enumerate(seq.scans):
        arr = np.zeros((len(scan), 4), np.float32)
        arr[:, :3] = scan
        arr.tofile(os.path.join(lidar_dir, f"{i:06d}.bin"))
        w = seq.imu_windows[i]
        with open(os.path.join(imu_dir, f"{i}.csv"), "w") as f:
            f.write("timestamp,acc_x,acc_y,acc_z,gyro_x,gyro_y,gyro_z\n")
            f.write("0,0,0,0,0,0,0\n")  # consumed by pandas header inference
            if w is not None:
                for row in w:
                    f.write(",".join(f"{v:.9f}" for v in row) + "\n")
    pose_path = os.path.join(root, "gt_kitti.txt")
    with open(pose_path, "w") as f:
        for T in seq.poses:
            f.write(" ".join(f"{v:.9f}" for v in T[:3, :4].reshape(-1)) + "\n")
    return {
        "pc_path": lidar_dir,
        "imu_path": imu_dir,
        "pose_path": pose_path,
    }


def write_reference_yaml(
    paths: dict, out_root: str, n_frames: int, large: bool = False
) -> str:
    """Reference-format YAML mirroring bench.py's workload parameters."""
    import yaml

    cfg = {
        "setting": {
            "name": "synth_ref_cpu",
            "output_root": os.path.join(out_root, "experiment"),
            "pc_path": paths["pc_path"],
            "imu_path": paths["imu_path"],
            "pose_path": paths["pose_path"],
            "deskew": False,
            "device": "cpu",
            "end_frame": n_frames,
        },
        "process": {
            "min_range_m": 0.5,
            "max_range_m": 60.0,
            "vox_down_m": 0.1,
        },
        "sampler": {
            "local_voxel_size_m": 0.2,
            "surface_sample_range_m": 0.25,
            "surface_sample_n": 4,
            "free_front_sample_n": 2,
            "free_behind_sample_n": 1,
        },
        "neuralpoints": {
            "voxel_size_m": 0.4,
            "num_nei_cells": 2,
            "search_alpha": 0.5,
            "weighted_first": True,
        },
        "loss": {"loss_weight_on": True, "dist_weight_scale": 0.8},
        "continual": {
            "batch_size_new_sample": 1000,
            "pool_capacity": 4194304 if large else 2097152,
            "pool_filter_freq": 10,
        },
        "tracker": {
            "measurement_noise_covariance": 0.01,
            "bias_noise_covariance": 0.0001,
            "source_vox_down_m": 0.6,
            "iter_n": 50,
        },
        "optimizer": {
            "iters": 10,
            "init_iter_ratio": 40,
            "batch_size": 16384,
            "learning_rate": 0.01,
            "adaptive_iters": True,
            "freeze_after_frame": 15,
        },
        "eval": {
            "wandb_vis_on": False,
            "o3d_vis_on": False,
            "silence_log": True,
            "mesh_freq_frame": 0,
            "save_map": False,
        },
    }
    path = os.path.join(out_root, "ref_config.yaml")
    os.makedirs(out_root, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--out", default="/tmp/ref_cpu_run")
    ap.add_argument("--azimuth", type=int, default=1024)
    ap.add_argument("--elev", type=int, default=32)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--seed", type=int, default=None,
                    help="override config.seed (decoder init / sampling)")
    ap.add_argument("--large", action="store_true",
                    help="bench.py's LARGE scenario (100 m hall, box "
                    "buildings + pillars, 15-frame static hold then a "
                    "25-frame ramp to full speed, spin-phase drift)")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from clid_slam_tpu.pipeline.synthetic import (
        generate_sequence, large_world,
    )

    # identical sequence to bench.py
    if args.large:
        # exactly bench.py's LARGE scenario (keep in sync with
        # bench.make_sequence)
        wrng = np.random.default_rng(11)
        seq = generate_sequence(
            n_frames=args.frames, n_azimuth=args.azimuth,
            n_elev=args.elev, noise_std=0.01, radius=32.0,
            period_frames=400.0, seed=3,
            world=large_world(wrng, room_radius=50.0),
            ramp_frames=25.0, hold_frames=15.0, spin_phase=True,
        )
    else:
        seq = generate_sequence(
            n_frames=args.frames,
            n_azimuth=args.azimuth,
            n_elev=args.elev,
            noise_std=0.01,
            seed=3,
        )
    paths = dump_reference_dataset(seq, args.out)
    yaml_path = write_reference_yaml(paths, args.out, args.frames, args.large)

    _install_stubs()
    sys.path.insert(0, REFERENCE)
    import torch

    torch.set_num_threads(args.threads)
    if not torch.cuda.is_available():
        # the reference pins its IESEKF update to CUDA
        # (utils/error_state_iekf.py:275-276, 334-336); on a CPU-only torch
        # build make .cuda() an identity so the same code runs on host
        torch.Tensor.cuda = lambda self, *a, **k: self

    from model.decoder import Decoder
    from model.local_point_cloud_map import LocalPointCloudMap
    from model.neural_points import NeuralPoints
    from utils.config import Config
    from utils.error_state_iekf import IEKFOM
    from utils.eval_traj_utils import absolute_error
    from utils.mapper import Mapper
    from utils.slam_dataset import SLAMDataset
    from utils.tools import freeze_model

    config = Config()
    config.load(yaml_path)
    config.device = "cpu"
    config.silence = True
    config.run_path = os.path.join(args.out, "experiment")
    os.makedirs(config.run_path, exist_ok=True)
    # seeding as setup_experiment does (utils/tools.py:191-196), without its
    # run-dir/git bookkeeping which assumes a writable git checkout
    if args.seed is not None:
        config.seed = args.seed
    np.random.seed(config.seed)
    torch.manual_seed(config.seed)

    geo_mlp = Decoder(config, config.geo_mlp_hidden_dim, config.geo_mlp_level, 1)
    neural_points = NeuralPoints(config)
    local_map = LocalPointCloudMap(config)
    dataset = SLAMDataset(config)
    iekfom = IEKFOM(config, neural_points, geo_mlp)
    dataset.tracker = iekfom
    mapper = Mapper(config, dataset, neural_points, local_map, geo_mlp)

    # seed the filter at gt[0] with the true initial velocity — exactly what
    # bench.py does for the TPU engine
    iekfom.x.rot = torch.tensor(seq.poses[0][:3, :3], dtype=config.tran_dtype)
    iekfom.x.pos = torch.tensor(seq.poses[0][:3, 3], dtype=config.tran_dtype)
    if args.large:
        # rest-start ramp: secant initial velocity (~0), same as bench.py
        vel0 = (seq.poses[1][:3, 3] - seq.poses[0][:3, 3]) / 0.1
    else:
        w = 2 * np.pi / 20.0
        vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    iekfom.x.vel = torch.tensor(vel0, dtype=config.tran_dtype)

    n = min(args.frames, dataset.total_pc_count)
    frame_times = []
    for frame_id in range(n):
        t0 = time.perf_counter()
        dataset.read_frame(frame_id)
        if not dataset.preprocess_frame():
            dataset.processed_frame += 1
            continue
        if frame_id > 0 and config.track_on:
            cur_pose_torch, valid_flag = iekfom.update_iterated(
                dataset.cur_source_points
            )
            dataset.lose_track = not valid_flag
            dataset.update_odom_pose(cur_pose_torch)

        neural_points.travel_dist = torch.tensor(
            dataset.travel_dist[: frame_id + 1],
            device=config.device,
            dtype=config.dtype,
        )
        valid_mapping = (not dataset.lose_track) and (not dataset.stop_status)
        if valid_mapping:
            mapper.process_frame(
                dataset.cur_point_cloud_torch,
                dataset.cur_sem_labels_torch,
                dataset.cur_pose_torch,
                frame_id,
                False,
            )
        else:
            mapper.determine_used_pose()
            neural_points.reset_local_map(
                dataset.cur_pose_torch[:3, 3], None, frame_id
            )

        cur_iters = (
            config.iters * config.init_iter_ratio if frame_id == 0 else config.iters
        )
        if dataset.stop_status:
            cur_iters = max(1, cur_iters - 10)
        if frame_id == config.freeze_after_frame:
            freeze_model(geo_mlp)
        mapper.mapping(cur_iters)

        dataset.processed_frame += 1
        dt = time.perf_counter() - t0
        frame_times.append(dt)
        terr = np.linalg.norm(
            dataset.odom_poses[frame_id][:3, 3] - seq.poses[frame_id][:3, 3]
        )
        print(
            f"# ref frame {frame_id}: {dt*1e3:.1f} ms, terr {terr:.4f} m",
            file=sys.stderr,
        )

    est = dataset.odom_poses[:n]
    gt = seq.poses[:n]
    np.savez(os.path.join(args.out, "traj.npz"), est=est, gt=gt)
    rot_rmse, tran_rmse, align_mat = absolute_error(gt, est, align_on=False)
    med = float(np.median(frame_times[1:])) if len(frame_times) > 1 else 0.0
    print(
        json.dumps(
            {
                "engine": "reference-cpu",
                "frames": n,
                "ate_rmse_m": round(float(tran_rmse), 4),
                "are_rmse_deg": round(float(rot_rmse), 4),
                "median_frame_ms": round(med * 1e3, 2),
                "neural_points": int(neural_points.count()),
                "threads": args.threads,
            }
        )
    )


if __name__ == "__main__":
    main()
