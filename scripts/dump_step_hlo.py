#!/usr/bin/env python3
"""Dump the compiled HLO of the streaming frame step and summarize the
named thunks seen in traces (fusion.NN / while.NN) back to source ops.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/dump_step_hlo.py [names...]
"""

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.config import Config
from clid_slam_tpu.pipeline.streaming import StreamingSlam
from clid_slam_tpu.pipeline.synthetic import generate_sequence


def main():
    names = sys.argv[1:] or [
        "fusion.63", "fusion.64", "fusion.65", "fusion.71", "fusion.72",
        "fusion.73", "fusion.969", "fusion.1084", "fusion.1071",
        "fusion.49", "fusion.36", "fusion.47", "fusion.1015",
    ]
    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.search_alpha = 0.5
    cfg.local_voxel_size_m = 0.2
    cfg.surface_sample_range_m = 0.25
    cfg.surface_sample_n = 4
    cfg.free_front_n = 2
    cfg.free_behind_n = 1
    cfg.vox_down_m = 0.1
    cfg.source_vox_down_m = 0.6
    cfg.min_range = 0.5
    cfg.max_range = 60.0
    cfg.bs = 16384
    cfg.bs_new_sample = 1000
    cfg.iters = 10
    cfg.init_iter_ratio = 40
    cfg.reg_iter_n = 50
    cfg.freeze_after_frame = 15
    cfg.loss_weight_on = True
    cfg.adaptive_iters = True
    cfg.map_capacity = 1 << 20
    cfg.map_hash_size = 1 << 22
    cfg.local_map_capacity = 1 << 19
    cfg.local_map_hash_size = 1 << 21
    cfg.max_scan_points = 1 << 15
    cfg.max_source_points = 1 << 13
    cfg.pool_capacity = 1 << 21
    cfg.pool_filter_freq = 10
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    cfg.diff_travel_dist_local = 1e9

    system = StreamingSlam(cfg, total_frames=24)
    step = system.steps[(True, False)]
    P = cfg.max_scan_points
    args = (
        system.state,
        jnp.zeros(P * 5 + 65 * 7, jnp.float32),
    )
    txt = step.lower(*args).compile().as_text()
    print(f"# HLO text: {len(txt)} chars", flush=True)
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)

    for nm in names:
        # find the computation definition line
        pat = re.compile(r"^\s*(?:ROOT )?%?" + re.escape(nm) + r" = .*$",
                         re.MULTILINE)
        m = pat.search(txt)
        if not m:
            print(f"--- {nm}: NOT FOUND")
            continue
        line = m.group(0)
        # extract metadata op_name if present
        meta = re.search(r'metadata=\{([^}]*)\}', line)
        print(f"--- {nm}:")
        print("   ", line[:240])
        if meta:
            print("    meta:", meta.group(1)[:220])


if __name__ == "__main__":
    main()
