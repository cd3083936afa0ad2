"""Streaming x sharded composition (pipeline/streaming_sharded.py):
the zero-readback production loop over a spatially sharded map — ONE
fused jitted call per frame with the collectives compiled inside
(VERDICT r4 item 3)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from clid_slam_tpu.pipeline.streaming_sharded import StreamingShardedSlam
from clid_slam_tpu.pipeline.synthetic import generate_sequence
from clid_slam_tpu.utils import metrics

sys.path.insert(0, os.path.dirname(__file__))
from test_slam_integration import tiny_config  # noqa: E402


def _run(n, n_devices, cfg=None, ckpt_at=None, ckpt_path=None):
    seq = generate_sequence(
        n_frames=n, n_azimuth=256, n_elev=24, noise_std=0.01, seed=3
    )
    cfg = cfg or tiny_config()
    system = StreamingShardedSlam(cfg, n_devices=n_devices,
                                  total_frames=n + 2)
    w = 2 * np.pi / 20.0
    system.seed_pose(
        seq.poses[0][:3, :3], seq.poses[0][:3, 3],
        seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0]),
    )
    system.precompile()
    for i in range(n):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        if ckpt_at is not None and i == ckpt_at:
            system.save_checkpoint(ckpt_path)
    system.block()
    return system, seq


def test_streaming_sharded_tracks():
    """Full streaming sharded loop over 4 virtual devices: tracks the
    synthetic room, spreads the map across shards, never reads back
    inside the loop."""
    n = 10
    system, seq = _run(n, 4)
    out = system.sync()
    m = metrics.absolute_error(
        out["odom_poses"][:n], seq.poses[:n], align=False
    )
    assert not out["failed"]
    # chaotic 10-frame loop: quality gate, not a pin (STATUS r1 numerics)
    assert m["ate_rmse_m"] < 0.35, m
    counts = np.asarray(system.state.map_state.count)
    assert counts.shape == (4,)
    assert (counts > 0).all(), counts
    assert out["neural_points"] == counts.sum()


def test_streaming_sharded_checkpoint_resume(tmp_path):
    """The StreamState pytree checkpoint works unchanged for the sharded
    state: a resumed run continues bit-exactly (streaming.py's
    save/load_checkpoint over sharded leaves)."""
    n, cut = 8, 4
    ckpt = str(tmp_path / "ss.npz")
    full, seq = _run(n, 2, ckpt_at=cut, ckpt_path=ckpt)
    full_traj = np.asarray(full.sync()["odom_poses"][:n])

    cfg = tiny_config()
    resumed = StreamingShardedSlam(cfg, n_devices=2, total_frames=n + 2)
    resumed.load_checkpoint(ckpt)
    for i in range(cut + 1, n):
        resumed.process_frame(i, seq.scans[i], seq.imu_windows[i])
    resumed.block()
    res_traj = np.asarray(resumed.sync()["odom_poses"][:n])
    np.testing.assert_array_equal(res_traj, full_traj)
