#!/usr/bin/env python3
"""Streaming-vs-classic accuracy isolation on the LARGE bench scenario
(r5, VERDICT item 1): the r4 artifact showed streaming-TPU 0.32 m vs
classic-CPU 0.124 m; streaming-CPU measured 0.259 m, so most of the gap
is the streaming DRIVER, not the platform. This script toggles one
streaming fast path at a time on the identical 200-frame sequence.

Usage: python scripts/diag_stream_parity.py <variant> [frames]
variants: base | uncached | ncand32 | ncand48 | f64boot | nodup | reprobe
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 200

import bench


def main():
    import jax

    cfg = bench.build_config(large=True)
    if variant == "uncached":
        cfg.track_cached = False
    elif variant == "ncand32":
        cfg.track_n_cand = 32
    elif variant == "ncand48":
        cfg.track_n_cand = 48
    elif variant == "tmr10":
        cfg.track_max_range = 10.0
    elif variant == "tmr30":
        cfg.track_max_range = 30.0
    elif variant == "behind2":
        cfg.free_behind_weight = 2.0
    elif variant == "nodup":
        cfg.map_dup_independent = False
        cfg.map_pallas = False
    seq = bench.make_sequence(True, n_frames)
    out, _ = bench.run_streaming(cfg, seq, n_frames, 10, "large")  # label "large" selects the rest-start vel0 branch in bench._vel0
    import json

    print(json.dumps({"variant": variant, **out}))


if __name__ == "__main__":
    main()
