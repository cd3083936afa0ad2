"""Full-system integration test: synthetic LiDAR-inertial sequence through
the complete SLAM loop (IMU propagation + IESEKF tracking + mapping), with
trajectory accuracy checked against ground truth — the M3 closed loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from clid_slam_tpu.config import Config
from clid_slam_tpu.pipeline.slam import SlamSystem
from clid_slam_tpu.pipeline.synthetic import generate_sequence
from clid_slam_tpu.utils import metrics


def tiny_config(**kw) -> Config:
    c = Config()
    c.voxel_size_m = 0.3
    c.search_alpha = 0.5
    c.local_voxel_size_m = 0.15
    c.surface_sample_range_m = 0.25
    c.surface_sample_n = 3
    c.free_front_n = 2
    c.free_behind_n = 1
    c.vox_down_m = 0.08
    c.source_vox_down_m = 0.4
    c.min_range = 0.5
    c.max_range = 30.0
    c.min_z = -5.0
    c.max_z = 30.0
    c.bs = 4096
    c.bs_new_sample = 512
    c.iters = 10
    c.init_iter_ratio = 40
    c.reg_iter_n = 20
    c.freeze_after_frame = 6
    c.loss_weight_on = True
    c.map_capacity = 1 << 15
    c.map_hash_size = 1 << 17
    c.local_map_capacity = 1 << 16
    c.local_map_hash_size = 1 << 17
    c.max_scan_points = 1 << 13
    c.max_source_points = 1 << 11
    # >= 2x the per-frame sample block (8192*7) so the stripe-ring append
    # fast path engages and several frames of replay history survive
    c.pool_capacity = 1 << 18
    c.track_on = True
    c.silence = True
    for k, v in kw.items():
        setattr(c, k, v)
    c._derive()
    # keep the travel-dist window irrelevant for the tiny scene
    c.diff_travel_dist_local = 1e9
    return c


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(
        n_frames=12, n_azimuth=256, n_elev=24, noise_std=0.01, seed=3
    )


def test_slam_closed_loop_tracks(seq):
    cfg = tiny_config()
    system = SlamSystem(cfg, total_frames=16)
    # circular trajectory starts with nonzero velocity — seed the filter
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])

    for i in range(len(seq.scans)):
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        assert st.tracking_ok, f"tracking failed at frame {i}"

    est = system.dataset.odom_poses[: len(seq.scans)]
    m = metrics.absolute_error(est, seq.poses, align=False)
    # The online SLAM loop is chaotically sensitive to float rounding: any
    # semantically-neutral change (hash layout, op reordering) lands the
    # 12-frame ATE anywhere in ~[0.05, 0.14] m on this sparse synthetic
    # scene. The threshold is set to catch real regressions (divergence,
    # frame-anchoring bugs produce >0.5 m), not to pin the noise.
    assert m["ate_rmse_m"] < 0.2, m
    assert m["are_rmse_deg"] < 3.0, m
    assert int(system.map_state.count) > 500


def test_slam_mapping_only_with_gt_poses(seq):
    """track_on=False + gt poses: pure mapping mode
    (the reference's pure-reconstruction path, utils/mapper.py:152-157)."""
    cfg = tiny_config(track_on=False)
    system = SlamSystem(cfg, total_frames=16)
    system.dataset.gt_poses = seq.poses
    system.dataset.gt_pose_provided = True

    for i in range(6):
        system.dataset.cur_pose_ref = seq.poses[i]
        system.dataset.odom_poses[i] = seq.poses[i]
        if i > 0:
            system.dataset.travel_dist[i] = system.dataset.travel_dist[
                i - 1
            ] + np.linalg.norm(
                seq.poses[i][:3, 3] - seq.poses[i - 1][:3, 3]
            )
        st = system.process_frame(i, seq.scans[i], None)
        assert np.isfinite(st.sdf_loss)
    assert int(system.map_state.count) > 300


def test_checkpoint_roundtrip(tmp_path, seq):
    cfg = tiny_config()
    system = SlamSystem(cfg, total_frames=16)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    for i in range(4):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    p = str(tmp_path / "ckpt.npz")
    system.save_checkpoint(p)

    system2 = SlamSystem(cfg, total_frames=16)
    system2.load_checkpoint(p)
    assert int(system2.map_state.count) == int(system.map_state.count)
    assert system2.dataset.processed_frame == 4
    np.testing.assert_allclose(
        np.asarray(system2.map_state.geo_feats),
        np.asarray(system.map_state.geo_feats),
    )
    # resumed system keeps tracking
    for i in range(4, 8):
        st = system2.process_frame(i, seq.scans[i], seq.imu_windows[i])
        assert st.tracking_ok


def test_adjust_map_keeps_tracking(seq):
    """Apply a PGO-style global pose correction mid-run: the map is
    rigidly moved with the corrected trajectory, queries switch into
    rotate_vecs mode, and tracking continues against the adjusted map
    (model/neural_points.py:814-838 + slam.py PGO plumbing)."""
    cfg = tiny_config()
    system = SlamSystem(cfg, total_frames=16)
    w = 2 * np.pi / 20.0
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = seq.poses[0][:3, :3] @ np.array([3.0 * w, 0, 0])
    for i in range(6):
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        assert st.tracking_ok

    # correction: a small global rotation+shift applied to the trajectory
    from clid_slam_tpu.utils import lie
    import jax.numpy as jnp

    D = np.eye(4)
    D[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.05])))
    D[:3, 3] = [0.2, -0.1, 0.05]
    corrected = np.einsum("ij,tjk->tik", D, system.dataset.odom_poses[:6])
    # tracker state must follow the corrected frame too
    system.tracker.x.rot = D[:3, :3] @ system.tracker.x.rot
    system.tracker.x.pos = D[:3, :3] @ system.tracker.x.pos + D[:3, 3]
    system.tracker.x.vel = D[:3, :3] @ system.tracker.x.vel
    system.adjust_map(corrected)
    assert system.after_pgo

    for i in range(6, len(seq.scans)):
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        assert st.tracking_ok, f"tracking failed at frame {i} after adjust"

    # estimated trajectory should now live in the corrected frame
    est = system.dataset.odom_poses[: len(seq.scans)]
    gt_corr = np.einsum("ij,tjk->tik", D, seq.poses)
    m = metrics.absolute_error(est, gt_corr, align=False)
    assert m["ate_rmse_m"] < 0.25, m
