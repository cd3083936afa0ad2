#!/usr/bin/env python3
"""Dead-reckon the host IEKF predict-only path (no scan updates) through
the large scenario's ramp, against ground truth. Isolates IMU synthesis +
propagation from registration: a perfect-IMU dead reckon should track the
ramp to sub-mm over a few seconds."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import bench as B
from clid_slam_tpu.odometry import iekf


def main():
    seq = B.make_sequence(True, 30)
    cfg = iekf.IEKFConfig()
    f = iekf.IEKF(cfg)
    f.x.pos = seq.poses[0][:3, 3].copy()
    f.x.rot = seq.poses[0][:3, :3].copy()
    f.x.vel = B._vel0(seq, "large")

    for i in range(1, 30):
        w = seq.imu_windows[i]
        for row in w:
            dt, ax, ay, az, gx, gy, gz = row
            f.predict(np.array([ax, ay, az]), np.array([gx, gy, gz]), dt)
        gt = seq.poses[i]
        e = f.x.pos - gt[:3, 3]
        vterr = np.linalg.norm(
            f.x.vel - (seq.poses[min(i + 1, 29)][:3, 3] - gt[:3, 3]) / 0.1
        )
        print(
            f"frame {i:2d}: pos err {np.linalg.norm(e)*1e3:8.2f} mm "
            f"({e.round(4)})  vel err {vterr:.4f} m/s"
        )


if __name__ == "__main__":
    main()
