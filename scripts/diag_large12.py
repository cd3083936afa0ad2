#!/usr/bin/env python3
"""r5: learned-FIELD floor bias under gt poses (no tracker feedback).

Runs the streaming prep+mapping with poses forced to ground truth each
frame (track=False path uses state.rot/pos as the mapping pose), then
measures the learned SDF's zero-crossing height above the true floor at
probe points ahead of the sensor. A nonzero crossing bias at gt poses is
pure mapping physics — the feed of the z ratchet.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench
from clid_slam_tpu.pipeline.streaming import StreamingSlam
from clid_slam_tpu.models import neural_map as nm, decoder as dec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120
cfg = bench.build_config(large=True)
cfg.track_on = False  # prep+mapping only; pose comes from state.rot/pos
seq = bench.make_sequence(True, N)
system = StreamingSlam(cfg, total_frames=N + 8)
system.precompile()
for i in range(N):
    T = seq.poses[i]
    st = system.state
    system.state = st._replace(
        rot=jnp.asarray(T[:3, :3], jnp.float32),
        pos=jnp.asarray(T[:3, 3], jnp.float32),
    )
    system.process_frame(i, seq.scans[i], seq.imu_windows[i])
system.block()
st = system.state
print(f"# mapped {int(st.map_state.count)} points over {N} gt frames",
      file=sys.stderr)

# probe vertical SDF profiles ahead of the sensor at various ranges
FLOOR = -1.8
T = seq.poses[N - 1]
fwd = seq.poses[min(N, len(seq.poses) - 1) - 1][:3, 3] - seq.poses[N - 5][:3, 3]
fwd = fwd / np.linalg.norm(fwd)
origin = T[:3, 3]

mvd2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
zs = np.linspace(FLOOR - 0.3, FLOOR + 0.5, 81)

@jax.jit
def sdf_at(pts):
    q = nm.query_feature(
        st.map_state, pts, system.nb_offs, cfg.voxel_size_m, mvd2,
        cfg.query_nn_k, st.travel_dist, N - 1, cfg.diff_travel_dist_local,
        True, encode_vecs=system.encode_vecs,
    )
    return dec.sdf(st.mlp, q.feature, cfg.sdf_scale), q.nn_count

for r in (3, 6, 10, 15, 20, -5, -10):
    # r<0 probes BEHIND the sensor (already driven-over region)
    biases = []
    for side in np.linspace(-2, 2, 5):
        perp = np.array([-fwd[1], fwd[0], 0.0])
        base = origin + fwd * r + perp * side
        pts = np.stack([np.full_like(zs, base[0]),
                        np.full_like(zs, base[1]), zs], axis=1)
        sdf, nn = sdf_at(jnp.asarray(pts, jnp.float32))
        sdf, nn = np.asarray(sdf), np.asarray(nn)
        ok = nn >= 6
        if ok.sum() < 10:
            continue
        sgn = np.sign(sdf)
        cross = None
        for j in range(len(zs) - 1):
            if ok[j] and ok[j + 1] and sdf[j] <= 0 <= sdf[j + 1]:
                t = -sdf[j] / (sdf[j + 1] - sdf[j] + 1e-12)
                cross = zs[j] + t * (zs[j + 1] - zs[j])
        if cross is not None:
            biases.append(cross - FLOOR)
    if biases:
        b = np.array(biases)
        print(f"r={r:+3d}m: zero-crossing bias mean {b.mean()*100:+6.2f} cm "
              f"(n={len(b)}, spread {b.std()*100:.2f})")
    else:
        print(f"r={r:+3d}m: no crossing found")
