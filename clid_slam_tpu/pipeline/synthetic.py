"""Synthetic LiDAR-inertial sequence generator for tests and benchmarks.

Ray-casts an analytic world (cylinder room + floor/ceiling + pillar
cylinders) from a smooth circular trajectory and synthesizes consistent
IMU windows (accelerometer = Rᵀ(p̈ - g), gyroscope = body rates), in the
same per-frame layout the reference's converter produces
(dataset/converter/rosbag2dataset_parallel.py:44-76): one point cloud +
one IMU CSV window per inter-frame interval.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

G = 9.81


@dataclass
class SyntheticWorld:
    room_radius: float = 8.0
    floor_z: float = -1.5
    ceil_z: float = 2.5
    pillars: List[Tuple[float, float, float]] = field(
        default_factory=lambda: [(3.0, 2.0, 0.5), (-2.5, -3.0, 0.7)]
    )  # (cx, cy, radius)

    def raycast(self, origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        """Distances along unit dirs [N,3] to the nearest surface."""
        n = len(dirs)
        t_best = np.full(n, np.inf)

        # outer cylinder x²+y²=R² (from inside; take positive root)
        ox, oy = origin[0], origin[1]
        dx, dy = dirs[:, 0], dirs[:, 1]
        a = dx * dx + dy * dy
        b = 2 * (ox * dx + oy * dy)
        c = ox * ox + oy * oy - self.room_radius**2
        disc = b * b - 4 * a * c
        valid = (disc > 0) & (a > 1e-12)
        t = np.where(valid, (-b + np.sqrt(np.maximum(disc, 0))) / (2 * a + 1e-30), np.inf)
        t = np.where(t > 1e-6, t, np.inf)
        t_best = np.minimum(t_best, t)

        # floor / ceiling planes
        dz = dirs[:, 2]
        for z0 in (self.floor_z, self.ceil_z):
            tz = np.where(np.abs(dz) > 1e-9, (z0 - origin[2]) / dz, np.inf)
            tz = np.where(tz > 1e-6, tz, np.inf)
            t_best = np.minimum(t_best, tz)

        # pillars (solid: take nearest positive root)
        for cx, cy, r in self.pillars:
            oxp, oyp = ox - cx, oy - cy
            bp = 2 * (oxp * dx + oyp * dy)
            cp = oxp * oxp + oyp * oyp - r * r
            disc = bp * bp - 4 * a * cp
            ok = (disc > 0) & (a > 1e-12)
            sq = np.sqrt(np.maximum(disc, 0))
            t1 = (-bp - sq) / (2 * a + 1e-30)
            t1 = np.where(ok & (t1 > 1e-6), t1, np.inf)
            # only count hits within the room height
            zhit = origin[2] + t1 * dz
            t1 = np.where(
                (zhit > self.floor_z) & (zhit < self.ceil_z), t1, np.inf
            )
            t_best = np.minimum(t_best, t1)
        return t_best


def lidar_directions(n_azimuth: int = 128, n_elev: int = 16) -> np.ndarray:
    az = np.linspace(-np.pi, np.pi, n_azimuth, endpoint=False)
    el = np.linspace(np.deg2rad(-22.5), np.deg2rad(22.5), n_elev)
    A, E = np.meshgrid(az, el, indexing="ij")
    d = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], -1
    )
    return d.reshape(-1, 3)


def circular_trajectory(
    n_frames: int, radius: float = 3.0, period_frames: float = 200.0,
    frame_dt: float = 0.1, ramp_frames: float = 0.0,
):
    """Pose per frame: moving on a circle, yaw tangent to motion.
    ``ramp_frames`` > 0 starts the platform AT REST and linearly ramps the
    angular rate over that many frames — the realistic boot condition (an
    IEKF initialized with zero velocity only converges on sequences that
    start near-stationary, like the real benchmark datasets do).
    Returns (poses [N,4,4], angular velocity [N,3] body, accel [N,3] body)."""
    w_max = 2 * np.pi / (period_frames * frame_dt)  # rad/s
    t_ramp = ramp_frames * frame_dt
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    omegas = np.zeros((n_frames, 3))
    accels = np.zeros((n_frames, 3))
    for i in range(n_frames):
        t = i * frame_dt
        if t_ramp > 0 and t < t_ramp:
            w = w_max * t / t_ramp  # θ' during ramp
            th = 0.5 * w_max * t * t / t_ramp
            wd = w_max / t_ramp  # θ''
        else:
            w = w_max
            th = w_max * (t - 0.5 * t_ramp) if t_ramp > 0 else w_max * t
            wd = 0.0
        p = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        yaw = th + np.pi / 2  # tangent
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = p
        # kinematics: p̈ = r(θ''[-sin,cos] - θ'²[cos,sin]); body rate [0,0,θ']
        pdd = np.array(
            [
                radius * (-wd * np.sin(th) - w * w * np.cos(th)),
                radius * (wd * np.cos(th) - w * w * np.sin(th)),
                0.0,
            ]
        )
        grav = np.array([0.0, 0.0, -G])
        accels[i] = R.T @ (pdd - grav)
        omegas[i] = np.array([0.0, 0.0, w])
    return poses, omegas, accels


@dataclass
class SyntheticSequence:
    poses: np.ndarray  # [N,4,4] ground truth
    scans: list  # list of [M,3] float32, sensor frame
    imu_windows: list  # list of [K,7] (dt, acc, gyro) per frame (None for 0)
    world: SyntheticWorld


def large_world(rng, room_radius: float = 50.0, n_pillars: int = 96,
                floor_z: float = -1.8, ceil_z: float = 6.0,
                feature_annulus: Tuple[float, float] = (24.0, 40.0)
                ) -> SyntheticWorld:
    """A production-scale environment: a big hall scattered with pillars
    (ncd128-like extents — 60 m range config sees walls and dozens of
    obstacles; the map grows to 1e5+ neural points with pruning firing).

    The hall wall + floor + ceiling are all surfaces of revolution about
    the room center, so a trajectory circling that center sees them as an
    along-track gauge symmetry — ONLY the pillars constrain along-track
    registration. Real halls are feature-rich at eye level, so half the
    pillars are seeded into ``feature_annulus`` (the band a circling
    platform traverses) to keep close-range structure in view everywhere
    along the loop; with the r2-era 24 sparse pillars the tracker slipped
    along the arc by ~the per-frame motion (measured r3: ATE 45 m)."""
    pillars = []
    for i in range(n_pillars):
        if i % 2 == 0:
            r = rng.uniform(*feature_annulus)
        else:
            r = rng.uniform(6.0, room_radius - 4.0)
        th = rng.uniform(0, 2 * np.pi)
        pillars.append(
            (r * np.cos(th), r * np.sin(th), rng.uniform(0.4, 2.2))
        )
    return SyntheticWorld(
        room_radius=room_radius, floor_z=floor_z, ceil_z=ceil_z,
        pillars=pillars,
    )


def generate_sequence(
    n_frames: int = 30,
    n_azimuth: int = 128,
    n_elev: int = 16,
    frame_dt: float = 0.1,
    imu_rate: int = 10,
    noise_std: float = 0.0,
    radius: float = 3.0,
    period_frames: float = 200.0,
    seed: int = 0,
    ramp_frames: float = 0.0,
    world: SyntheticWorld = None,
) -> SyntheticSequence:
    rng = np.random.default_rng(seed)
    if world is None:
        world = SyntheticWorld()
    poses, omegas, accels = circular_trajectory(
        n_frames, radius, period_frames, frame_dt, ramp_frames
    )
    dirs_body = lidar_directions(n_azimuth, n_elev)

    scans = []
    imu_windows = [None]
    for i in range(n_frames):
        R, p = poses[i, :3, :3], poses[i, :3, 3]
        dirs_w = dirs_body @ R.T
        t = world.raycast(p, dirs_w)
        hit = np.isfinite(t) & (t < 60.0) & (t > 0.5)
        pts_body = dirs_body[hit] * t[hit][:, None]
        if noise_std > 0:
            pts_body = pts_body + rng.normal(0, noise_std, pts_body.shape)
        scans.append(pts_body.astype(np.float32))
        if i > 0:
            k = imu_rate
            dt = frame_dt / k
            rows = np.zeros((k, 7))
            for j in range(k):
                a = 0.5 * (accels[i - 1] + accels[i])
                g = 0.5 * (omegas[i - 1] + omegas[i])
                rows[j] = [dt, a[0], a[1], a[2], g[0], g[1], g[2]]
            imu_windows.append(rows)
    return SyntheticSequence(poses, scans, imu_windows, world)


def write_sequence_dataset(
    seq: SyntheticSequence, root: str, config_overrides: dict | None = None
) -> str:
    """Dump a synthetic sequence in the CLID converter on-disk layout
    (dataset/converter/rosbag2dataset_parallel.py output format):
    ``lidar/{i}.ply`` (+ per-point timestamp column), ``imu/{i}.csv``
    (dt, ax, ay, az, gx, gy, gz with header), ``gt_poses.txt`` (TUM), and a
    ready-to-run ``config.yaml``. Returns the config path — the file-based
    CLI (`python -m clid_slam_tpu.pipeline.slam <config>`) runs it."""
    import os

    import yaml

    from ..utils import io

    lidar_dir = os.path.join(root, "lidar")
    imu_dir = os.path.join(root, "imu")
    os.makedirs(lidar_dir, exist_ok=True)
    os.makedirs(imu_dir, exist_ok=True)
    for i, scan in enumerate(seq.scans):
        ts = np.linspace(0.0, 1.0, len(scan), dtype=np.float32)
        io.write_ply(
            os.path.join(lidar_dir, f"{i:06d}.ply"),
            scan,
            extra={"timestamp": ts},
        )
        w = seq.imu_windows[i]
        if w is None:
            w = np.zeros((1, 7))
        with open(os.path.join(imu_dir, f"{i:06d}.csv"), "w") as f:
            f.write("dt,ax,ay,az,gx,gy,gz\n")
            for row in w:
                f.write(",".join(f"{v:.9f}" for v in row) + "\n")
    io.write_tum_poses(os.path.join(root, "gt_poses.txt"), seq.poses)

    cfg = {
        "setting": {
            "name": "synthetic_replay",
            "output_root": os.path.join(root, "out"),
            "pc_path": lidar_dir,
            "imu_path": imu_dir,
            "pose_path": os.path.join(root, "gt_poses.txt"),
            "deskew": False,
        },
        "process": {
            "min_range_m": 0.5,
            "max_range_m": 30.0,
            "vox_down_m": 0.08,
        },
        "sampler": {
            "local_voxel_size_m": 0.15,
            "surface_sample_range_m": 0.25,
            "surface_sample_n": 3,
            "free_front_sample_n": 2,
            "free_behind_sample_n": 1,
        },
        "neuralpoints": {"voxel_size_m": 0.3, "search_alpha": 0.5},
        "loss": {"loss_weight_on": True},
        "optimizer": {"iters": 10, "batch_size": 4096, "init_iter_ratio": 40},
        "tracker": {"iter_n": 20, "source_vox_down_m": 0.4},
        "eval": {"save_map": True, "save_mesh": True, "silence_log": False},
        "tpu": {
            "map_capacity": 1 << 15,
            "map_hash_size": 1 << 17,
            "local_map_capacity": 1 << 16,
            "local_map_hash_size": 1 << 17,
            "max_scan_points": 1 << 13,
            "max_source_points": 1 << 11,
            "pool_capacity": 1 << 16,
        },
    }
    for k, v in (config_overrides or {}).items():
        sect, key = k.split(".", 1)
        cfg.setdefault(sect, {})[key] = v
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


if __name__ == "__main__":
    import sys

    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clid_synth_ds"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    # rest-start ramp: the CLI boots the filter with zero velocity
    s = generate_sequence(n_frames=n, n_azimuth=256, n_elev=24,
                          noise_std=0.01, seed=3, ramp_frames=6)
    p = write_sequence_dataset(s, out_root)
    print(p)
