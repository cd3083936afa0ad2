#!/usr/bin/env python3
"""Measure the actual prior/measurement balance at ramp frames: P_prior
pose sigma after IMU propagation, S6 measurement information, and the
resulting posterior step vs what the prior said."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import copy

    import bench as B
    from clid_slam_tpu.pipeline.slam import SlamSystem

    cfg = B.build_config(large=True)
    N = 24
    seq = B.make_sequence(True, N)

    system = SlamSystem(cfg, total_frames=B.TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = B._vel0(seq, "large")

    for i in range(N):
        if i >= 15:
            # replicate the predict on a copy to expose the prior
            tr = copy.deepcopy(system.tracker)
            w = seq.imu_windows[i]
            for row in w:
                tr.predict(row[1:4], row[4:7], row[0])
            gt = seq.poses[i]
            prior_err = tr.x.pos - gt[:3, 3]
            sig_pos = np.sqrt(np.diag(tr.P)[3:6])
            sig_vel = np.sqrt(np.diag(tr.P)[6:9])
            print(
                f"frame {i}: prior terr {np.linalg.norm(prior_err)*1e3:7.2f} mm  "
                f"sig_pos(mm) {(sig_pos*1e3).round(2)}  "
                f"sig_vel(mm/s) {(sig_vel*1e3).round(1)}"
            )
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        if i >= 15:
            gt = seq.poses[i]
            post_err = system.tracker.x.pos - gt[:3, 3]
            print(
                f"        post terr {np.linalg.norm(post_err)*1e3:7.2f} mm  "
                f"iters {system._last_track_iters}"
            )


if __name__ == "__main__":
    main()
