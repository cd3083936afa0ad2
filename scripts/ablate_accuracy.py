#!/usr/bin/env python3
"""Ablate each r2 speed approximation against the exact path and measure
its ATE cost on the bench sequence (same scans/IMU as bench.py).

The online SLAM loop is chaotic: a single 25-frame run has ~+-0.1 m ATE
spread across decoder-init seeds, so each variant runs over several engine
seeds and the comparison is on the mean. CPU (deterministic, ~0.7 s/frame
at bench scale).

Usage: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/ablate_accuracy.py \
           [--frames 25] [--seeds 3,7,11] [--variants base,exact,...]
"""

import argparse
import json
import sys
import time

import numpy as np


VARIANTS = {
    # name -> config overrides on top of bench.build_config()
    "base": {},
    "requery_track": {"track_cached": False},
    "ncand32": {"track_n_cand": 32},
    "resample1": {"map_resample_every": 1},
    "resample5": {"map_resample_every": 5},
    "no_stagnation": {"stagnation_iter": 1000},
    "exact": {
        "track_cached": False,
        "map_resample_every": 1,
        "stagnation_iter": 1000,
    },
}


def run_once(cfg, seq, n_frames):
    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.utils import metrics

    w = 2 * np.pi / 20.0
    vel0 = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    system = StreamingSlam(cfg, total_frames=n_frames + 8)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    for i in range(n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    out = system.sync()
    est = out["odom_poses"][:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    return m["ate_rmse_m"], out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    from clid_slam_tpu.pipeline.synthetic import generate_sequence

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--seeds", default="3,7,11")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    names = [v for v in args.variants.split(",") if v]

    seq = generate_sequence(
        n_frames=args.frames, n_azimuth=1024, n_elev=32,
        noise_std=0.01, seed=3,
    )

    results = {}
    for name in names:
        over = VARIANTS[name]
        ates = []
        for seed in seeds:
            cfg = bench.build_config()
            cfg.seed = seed
            for k, v in over.items():
                setattr(cfg, k, v)
            t0 = time.perf_counter()
            ate, _ = run_once(cfg, seq, args.frames)
            ates.append(ate)
            print(
                f"# {name:>14s} seed={seed}: ATE {ate:.4f} m "
                f"({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr, flush=True,
            )
        results[name] = {
            "ates": [round(a, 4) for a in ates],
            "mean": round(float(np.mean(ates)), 4),
            "std": round(float(np.std(ates)), 4),
        }
        print(f"## {name}: mean {results[name]['mean']} "
              f"+- {results[name]['std']}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
