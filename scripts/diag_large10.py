#!/usr/bin/env python3
"""r5 accuracy diag: per-frame error decomposition of the large bench for
the streaming vs classic drivers. Dumps est/gt trajectories to npz so the
divergence onset and axis (along-track / cross-track / z) can be located.

Usage: python scripts/diag_large10.py {streaming|classic} out.npz [frames]
       [--ncand N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench

mode = sys.argv[1]
out_path = sys.argv[2]
n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 200
cfg = bench.build_config(large=True)
for i, a in enumerate(sys.argv):
    if a == "--ncand":
        cfg.track_n_cand = int(sys.argv[i + 1])

seq = bench.make_sequence(True, n_frames)
if mode == "streaming":
    res, system = bench.run_streaming(cfg, seq, n_frames, 5, "large")  # label "large" selects the rest-start vel0 branch
    est = np.asarray(system.sync()["odom_poses"][:n_frames])
    extra = {
        "track_iters": np.asarray(system.state.track_iters[:n_frames]),
        "losses": np.asarray(system.state.losses[:n_frames]),
    }
else:
    res, system = bench.run_classic(cfg, seq, n_frames, 5, "large")
    est = np.asarray(system.dataset.odom_poses[:n_frames])
    extra = {}
np.savez(out_path, est=est, gt=seq.poses[:n_frames], **extra)
print(mode, res)
