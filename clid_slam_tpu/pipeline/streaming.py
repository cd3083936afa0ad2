"""Zero-readback streaming SLAM loop — the TPU-native production path.

The classic loop (pipeline/slam.py) mirrors the reference's host-driven
frame structure (slam.py:135-389): the host reads back the pose, filter
state, and counters every frame. On a remote-attached TPU runtime every
device->host readback forces the dispatch path out of its pipelined mode
(measured on this pool: 0.07 ms -> 24 ms per dispatch, permanently), and
even on a local chip it serializes the pipeline.

This module keeps the ENTIRE recurrent state of the SLAM system on device:

- the 18-state IESEKF (f32, equilibrated solves — validated against the
  f64 host filter), propagated AND updated inside the frame step;
- odometry bookkeeping: pose history, travel distance, stop detection,
  lose-track / failure flags (utils/slam_dataset.py:505-577 semantics);
- the neural map, local label map, replay pool, decoder params;
- the adaptive-iteration controller (utils/mapper.py:446-459) — the
  mapping fori_loop trip count is a device scalar.

One frame = ONE fused jitted call (predict + deskew + iterated update +
map prep + adaptive iters + mapping), with donated state. The host only
uploads scan buffers and enqueues; results are fetched once at the end
(`sync()`). Tracking uses the candidate-cached iterated update
(odometry/iekf.py:make_cached_update_fn): one hash probe + feature gather
per frame, dense math per iteration.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..mapping import mapper as mp
from ..mapping import prep as prp
from ..models import decoder as dec
from ..models import local_map as lm
from ..models import neural_map as nm
from ..odometry import iekf
from ..ops.encoding import make_encoder
from ..ops.voxel import neighbor_offsets, voxel_down_sample_mask
from ..utils import lie
from ..utils.transforms import adaptive_crop_range, crop_mask, deskew
from .dataset import SLAMDataset

G_M_S2 = iekf.G_M_S2

# static IMU-row bucket (covers 100-640 Hz IMU at 10 Hz LiDAR); part of
# the packed frame-buffer layout, so a shared constant
IMU_MAX_ROWS = 64


class StreamState(NamedTuple):
    # IESEKF (f32 on device; see odometry/iekf.py numerics notes)
    rot: jnp.ndarray  # [3,3]
    pos: jnp.ndarray  # [3]
    rest: jnp.ndarray  # [12] vel, bg, ba, grav
    P: jnp.ndarray  # [18,18]
    # odometry bookkeeping (utils/slam_dataset.py:505-577)
    last_pose: jnp.ndarray  # [4,4]
    odom_poses: jnp.ndarray  # [T,4,4]
    travel_dist: jnp.ndarray  # [T]
    lose_track: jnp.ndarray  # bool
    consec_lose: jnp.ndarray  # i32
    stop_count: jnp.ndarray  # i32
    stop_status: jnp.ndarray  # bool
    failed: jnp.ndarray  # bool (unrecoverable: too-large tran / lost >10)
    # map + training state
    map_state: nm.NeuralMapState
    local_map: lm.LocalMapState
    pool: object
    mlp: dec.MLPParams
    color_mlp: dec.MLPParams
    sem_mlp: dec.MLPParams
    key: jnp.ndarray
    # diagnostics (device scalars, fetched only at sync)
    losses: jnp.ndarray  # [T,2] (sdf, eik) per frame
    track_iters: jnp.ndarray  # [T] i32


def pack_adapter(step, p_cap: int, imu_max_rows: int):
    """Wrap an 11-arg frame-step body into the ONE-buffer packed calling
    convention ``step(state, frame_pack [p_cap*5 + (imu_max_rows+1)*7])``.

    Layout: first p_cap*5 floats are the scan block [p_cap,5] with columns
    (x, y, z, mask, point_ts); then an aux block [imu_max_rows+1, 7] whose
    rows 0..K-1 are IMU rows (dt, acc, gyro) and whose LAST row carries the
    frame scalars (frame_id, imu_count, crop_max_range, iters_base,
    mlp_lr_scale, allow_restart, 0). Rationale: the tunnel runtime
    serializes ~1.2 ms of device time per host->device buffer regardless
    of size (scripts/probe_enqueue.py); the old 10-buffer argument set
    cost ~12 ms/frame of device idle (probe_prestaged.py: wall 120 ms vs
    device busy 104 ms). One upload reclaims most of it."""
    scan_n = p_cap * 5

    def packed(state, frame_pack):
        scan_pack = frame_pack[:scan_n].reshape(p_cap, 5)
        aux_pack = frame_pack[scan_n:].reshape(imu_max_rows + 1, 7)
        points = scan_pack[:, :3]
        pmask = scan_pack[:, 3] > 0.5
        point_ts = scan_pack[:, 4]
        imu_rows = aux_pack[:-1]
        s = aux_pack[-1]
        return step(
            state,
            s[0].astype(jnp.int32),
            points,
            pmask,
            point_ts,
            imu_rows,
            s[1].astype(jnp.int32),
            s[2],
            s[3].astype(jnp.int32),
            s[4],
            s[5] > 0.5,
        )

    return jax.jit(packed, donate_argnums=(0, 1))


def pack_frame_buffers(
    p_cap: int,
    imu_max_rows: int,
    points,  # [n,3] np
    point_ts,  # [n] np or None
    imu_window,  # [k,7] np or None
    frame_id: int,
    crop_max_range: float,
    iters_base: int,
    mlp_lr_scale: float,
    allow_restart: bool,
):
    """Host-side packing for ``pack_adapter``'s calling convention."""
    n = min(points.shape[0], p_cap)
    pack = np.zeros(p_cap * 5 + (imu_max_rows + 1) * 7, np.float32)
    scan = pack[: p_cap * 5].reshape(p_cap, 5)
    aux = pack[p_cap * 5 :].reshape(imu_max_rows + 1, 7)
    scan[:n, :3] = points[:n, :3]
    scan[:n, 3] = 1.0
    if point_ts is not None:
        scan[:n, 4] = np.asarray(point_ts, np.float32).reshape(-1)[:n]
    k = 0
    if imu_window is not None and len(imu_window):
        k = min(len(imu_window), imu_max_rows)
        aux[:k] = imu_window[:k]
    aux[-1, :6] = (
        float(frame_id),
        float(k),
        float(crop_max_range),
        float(iters_base),
        float(mlp_lr_scale),
        1.0 if allow_restart else 0.0,
    )
    return pack


def make_frame_step(cfg: Config, nb_offs, encode_vecs, *, total_frames: int):
    """Build the fused frame-step executables.

    Returns a dict keyed by (track: bool, filter_pool_now: bool) of jitted
    functions in the packed convention (see ``pack_adapter``):
      step(state, scan_pack, aux_pack) -> new_state
    """
    max_valid_dist2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
    max_sdf_std = cfg.surface_sample_range_m * cfg.max_sdf_std_ratio
    S = cfg.max_source_points
    window = cfg.diff_travel_dist_local

    n_cand = cfg.track_n_cand or max(16, cfg.query_nn_k * 2)
    make_upd = (
        partial(iekf.make_cached_update_fn, n_cand=n_cand)
        if cfg.track_cached
        else iekf.make_update_iterated_fn
    )
    cached_update = make_upd(
        knn_k=cfg.query_nn_k,
        nb_offs=nb_offs,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale,
        min_grad_norm=cfg.reg_min_grad_norm,
        max_grad_norm=cfg.reg_max_grad_norm,
        min_nn_count=cfg.track_mask_query_nn_k,
        max_iteration=cfg.reg_iter_n,
        term_thre_deg=cfg.reg_term_thre_deg,
        term_thre_m=cfg.reg_term_thre_m,
        mlp_leaky=cfg.mlp_leaky_relu,
        mlp_bf16=cfg.mlp_bf16,
        encode_vecs=encode_vecs,
        weighted_first=cfg.weighted_first,
        layer_norm=cfg.layer_norm_on,
        max_sdf_std=max_sdf_std,
        stagnation_iter=cfg.stagnation_iter,
        info_scale=cfg.tracker_info_scale,
    )

    # two mapping bodies: the tracked steady path is statically a SINGLE
    # batch per frame (max_outer=1, resample window covering the adaptive
    # maximum iters+10) -- the r4 TPU trace showed the general dynamic
    # outer loop spends ~27 ms/frame copying full-capacity slab carries
    # even when only one batch runs; frame 0 (track=False, iters x40
    # warm-up) keeps the general multi-batch body.
    map_kw = dict(
        feature_dim=cfg.feature_dim,
        knn_k=cfg.query_nn_k,
        nb_offs=nb_offs,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale,
        sigma=cfg.sdf_scale,
        loss_type=cfg.main_loss_type,
        bs=cfg.bs,
        bs_new=cfg.bs_new_sample,
        gradient_decimation=cfg.gradient_decimation,
        num_grad_eps=cfg.num_grad_eps,
        weight_e=cfg.weight_e,
        loss_weight_on=cfg.loss_weight_on,
        lr=cfg.lr,
        adam_eps=cfg.adam_eps,
        mlp_leaky=cfg.mlp_leaky_relu,
        mlp_bf16=cfg.mlp_bf16,
        color_on=cfg.color_on,
        sem_on=cfg.semantic_on,
        weight_i=cfg.weight_i,
        weight_s=cfg.weight_s,
        surface_sample_range_m=cfg.surface_sample_range_m,
        encode_vecs=encode_vecs,
        weighted_first=cfg.weighted_first,
        layer_norm=cfg.layer_norm_on,
        resample_every=cfg.map_resample_every,
        as_body=True,
    )
    mapping_body = mp.make_mapping_fn(**map_kw)
    fast_kw = dict(
        map_kw,
        resample_every=max(cfg.map_resample_every, cfg.iters + 10),
        max_outer=1,
        dup_independent=cfg.map_dup_independent,
        use_pallas=cfg.map_pallas and jax.default_backend() == "tpu",
    )
    mapping_body_fast = mp.make_mapping_fn(**fast_kw)

    prep_bodies = {
        fp: prp.make_prep_fn(
            resolution=cfg.voxel_size_m,
            local_resolution=cfg.local_voxel_size_m,
            local_map_size=cfg.local_map_size,
            window_radius=cfg.window_radius,
            surface_sample_range_m=cfg.surface_sample_range_m,
            surface_sample_n=cfg.surface_sample_n,
            free_front_n=cfg.free_front_n,
            free_behind_n=cfg.free_behind_n,
            free_sample_begin_ratio=cfg.free_sample_begin_ratio,
            free_sample_end_dist_m=cfg.free_sample_end_dist_m,
            max_range=cfg.max_range,
            dist_weight_on=cfg.dist_weight_on,
            dist_weight_scale=cfg.dist_weight_scale,
            map_surface_ratio=cfg.map_surface_ratio,
            from_sample_points=cfg.from_sample_points,
            new_certainty_thre=cfg.new_certainty_thre,
            novelty_on=cfg.bs_new_sample > 0,
            novelty_mode=cfg.novelty_mode,
            filter_pool_now=fp,
            pin_mode=cfg.use_pin_mapper,
            behind_dropoff_on=cfg.behind_dropoff_on,
            incidence_label_on=cfg.incidence_label_on,
            incidence_min_factor=cfg.incidence_min_factor,
            incidence_degenerate_factor=cfg.incidence_degenerate_factor,
            free_behind_weight=cfg.resolved_free_behind_weight(),
            as_body=True,
        )
        for fp in (False, True)
    }

    dyn_filter = None
    if cfg.dynamic_filter_on:
        from ..mapping.dynamic_filter import make_dynamic_filter_fn

        dyn_filter = make_dynamic_filter_fn(
            knn_k=cfg.query_nn_k,
            nb_offs=nb_offs,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=max_valid_dist2,
            sdf_scale=cfg.sdf_scale,
            certainty_thre=cfg.dynamic_certainty_thre,
            sdf_ratio_thre=cfg.dynamic_sdf_ratio_thre,
            mlp_leaky=cfg.mlp_leaky_relu,
            mlp_bf16=cfg.mlp_bf16,
            encode_vecs=encode_vecs,
        )

    def _orthonormalize(R):
        """Project an almost-rotation back to SO(3) (Gram-Schmidt; the f32
        while_loop drifts the determinant by ~1e-6/frame)."""
        a = R[:, 0] / jnp.linalg.norm(R[:, 0])
        b = R[:, 1] - jnp.dot(a, R[:, 1]) * a
        b = b / jnp.linalg.norm(b)
        c = jnp.cross(a, b)
        return jnp.stack([a, b, c], axis=1)

    def make_step(track: bool, filter_pool_now: bool):
        prep_body = prep_bodies[filter_pool_now]

        def step(
            state: StreamState,
            frame_id,  # device i32
            points,  # [P,3] sensor frame, padded
            pmask,  # [P]
            point_ts,  # [P] in [0,1] (zeros when deskew off)
            imu_rows,  # [K,7]
            imu_count,  # i32
            crop_max_range,  # f32 (host-computed adaptive range)
            iters_base,  # i32
            mlp_lr_scale,  # f32
            allow_restart,  # bool (frame_id > freeze_after_frame)
        ) -> StreamState:
            # ---- device preprocess: crop + voxel masks
            pmask = pmask & crop_mask(
                points, cfg.min_z, cfg.max_z, cfg.min_range, crop_max_range
            )
            scale = crop_max_range / cfg.max_range
            train_mask = voxel_down_sample_mask(
                points, pmask, scale * cfg.vox_down_m, cfg.map_hash_size
            )

            rot, pos = state.rot, state.pos
            rest, P = state.rest, state.P
            odom_poses = state.odom_poses
            travel_dist = state.travel_dist
            lose_track = state.lose_track
            consec_lose = state.consec_lose
            stop_count, stop_status = state.stop_count, state.stop_status
            failed = state.failed
            track_iters = state.track_iters

            if track:
                # IMU propagation (utils/slam_dataset.py:380-393 drives
                # tracker.predict per IMU row)
                Q = jnp.zeros((12, 12), jnp.float32)
                Q = Q.at[0:3, 0:3].set(
                    cfg.measurement_noise_covariance * jnp.eye(3)
                )
                Q = Q.at[3:6, 3:6].set(
                    cfg.measurement_noise_covariance * jnp.eye(3)
                )
                Q = Q.at[6:9, 6:9].set(
                    cfg.bias_noise_covariance * jnp.eye(3)
                )
                Q = Q.at[9:12, 9:12].set(
                    cfg.bias_noise_covariance * jnp.eye(3)
                )
                vel, bg, ba, grav = (
                    rest[0:3], rest[3:6], rest[6:9], rest[9:12]
                )
                rot, pos, vel, bg, ba, grav, P = iekf.device_predict_imu(
                    rot, pos, vel, bg, ba, grav, P, Q, imu_rows, imu_count
                )
                rest = jnp.concatenate([vel, bg, ba, grav])

                # source cloud: voxel downsample + compact to S rows
                src_mask = voxel_down_sample_mask(
                    points, train_mask, scale * cfg.source_vox_down_m,
                    cfg.map_hash_size,
                )
                if cfg.track_max_range > 0:
                    # registration-only range gate (config.track_max_range
                    # rationale): mapping keeps the full cropped cloud
                    src_mask = src_mask & (
                        jnp.linalg.norm(points, axis=-1)
                        <= cfg.track_max_range
                    )
                n_src = jnp.sum(src_mask.astype(jnp.int32))
                (src_idx,) = jnp.nonzero(src_mask, size=S, fill_value=0)
                smask = jnp.arange(S) < n_src
                src_pts = points[src_idx]
                if cfg.deskew:
                    # deskew with the IMU-propagated relative guess
                    guess = (
                        jnp.eye(4, dtype=jnp.float32)
                        .at[:3, :3].set(rot)
                        .at[:3, 3].set(pos)
                    )
                    rel = jnp.linalg.inv(state.last_pose) @ guess
                    src_pts = deskew(src_pts, point_ts[src_idx], rel)

                rot, pos, rest, P, ok, n_iter = cached_update(
                    state.map_state, state.mlp, src_pts, smask,
                    rot, pos, rest, P, travel_dist, frame_id, window,
                )
                rot = _orthonormalize(rot)
                track_iters = track_iters.at[frame_id].set(n_iter)

                pose = (
                    jnp.eye(4, dtype=jnp.float32)
                    .at[:3, :3].set(rot)
                    .at[:3, 3].set(pos)
                )
                # odometry bookkeeping (utils/slam_dataset.py:505-577)
                last_tran = jnp.linalg.inv(state.last_pose) @ pose
                tran_norm = jnp.linalg.norm(last_tran[:3, 3])
                near_I = jnp.all(
                    jnp.abs(last_tran[:3, :3] - jnp.eye(3)) < 1e-3
                ) & jnp.all(
                    jnp.abs(last_tran[:3, 3]) < cfg.voxel_size_m * 0.1
                )
                stop_count = jnp.where(near_I, stop_count + 1, 0)
                stop_status = stop_count > cfg.stop_frame_thre
                too_big = tran_norm > cfg.surface_sample_range_m * 40.0
                lose_track = ~ok | too_big
                consec_lose = jnp.where(lose_track, consec_lose + 1, 0)
                failed = failed | too_big | (consec_lose > 10)
                travel_dist = travel_dist.at[frame_id].set(
                    travel_dist[jnp.maximum(frame_id - 1, 0)] + tran_norm
                )
                odom_poses = odom_poses.at[frame_id].set(pose)
                if cfg.deskew:
                    full = deskew(points, point_ts, last_tran)
                    points = jnp.where(train_mask[:, None], full, points)
                last_pose = pose
            else:
                pose = (
                    jnp.eye(4, dtype=jnp.float32)
                    .at[:3, :3].set(rot)
                    .at[:3, 3].set(pos)
                )
                odom_poses = odom_poses.at[frame_id].set(pose)
                travel_dist = travel_dist.at[frame_id].set(
                    travel_dist[jnp.maximum(frame_id - 1, 0)]
                )
                last_pose = pose

            # ---- dynamic-object filter (slam.py:170-176: frame>0 only) —
            # drop measurements landing in confidently-observed free space
            if dyn_filter is not None and track:
                world = points @ pose[:3, :3].T + pose[:3, 3]
                train_mask = dyn_filter(
                    state.map_state, state.mlp, world, train_mask,
                    travel_dist, frame_id, window,
                )

            # ---- map prep, gated by tracking validity (slam.py:167-181:
            # a lost/stopped frame must not corrupt the map)
            valid_mapping = ~lose_track & ~stop_status
            key, k_prep = jax.random.split(state.key)
            res = prep_body(
                state.map_state,
                state.local_map,
                state.pool,
                k_prep,
                points,
                train_mask & valid_mapping,
                pose,
                travel_dist,
                frame_id,
                window,
                None,
                None,
            )

            # ---- adaptive iteration offset (utils/mapper.py:446-459)
            iters = iters_base
            if cfg.adaptive_iters and cfg.bs_new_sample > 0:
                ratio = res.new_sample_count / jnp.maximum(
                    res.cur_sample_count, 1
                )
                offset = jnp.where(
                    ratio < cfg.new_sample_ratio_less,
                    -5,
                    jnp.where(
                        ratio > cfg.new_sample_ratio_more,
                        jnp.where(
                            allow_restart
                            & (ratio > cfg.new_sample_ratio_restart),
                            10,
                            5,
                        ),
                        0,
                    ),
                )
                iters = iters + offset
            iters = jnp.where(stop_status, iters - 10, iters)
            iters = jnp.maximum(iters, 1)

            key, k_map = jax.random.split(key)
            map_fn = mapping_body_fast if track else mapping_body
            map_state, mlp, color_mlp, sem_mlp, loss2 = map_fn(
                res.map_state,
                state.mlp,
                state.color_mlp,
                state.sem_mlp,
                res.pool,
                travel_dist,
                frame_id,
                window,
                k_map,
                iters,
                mlp_lr_scale,
            )
            losses = state.losses.at[frame_id].set(loss2)

            return StreamState(
                rot=rot,
                pos=pos,
                rest=rest,
                P=P,
                last_pose=last_pose,
                odom_poses=odom_poses,
                travel_dist=travel_dist,
                lose_track=lose_track,
                consec_lose=consec_lose,
                stop_count=stop_count,
                stop_status=stop_status,
                failed=failed,
                map_state=map_state,
                local_map=res.local_map,
                pool=res.pool,
                mlp=mlp,
                color_mlp=color_mlp,
                sem_mlp=sem_mlp,
                key=key,
                losses=losses,
                track_iters=track_iters,
            )

        return pack_adapter(step, cfg.max_scan_points, IMU_MAX_ROWS)

    return {
        (tr, fp): make_step(tr, fp)
        for tr in (False, True)
        for fp in (False, True)
    }


def make_ba_step(cfg: Config, nb_offs, encode_vecs):
    """Sliding-window bundle adjustment as a zero-readback device step:
    refine the last ``ba_frame`` poses + map features, write the corrected
    poses back into the on-device trajectory, and re-express the replay
    pool's world coords (the classic loop's _bundle_adjust, slam.py
    equivalent of utils/mapper.py:866-965 + :323-327, without any host
    readback)."""
    from ..mapping import pool as pl
    from ..mapping.bundle_adjustment import make_ba_fn

    w = cfg.ba_frame
    max_valid_dist2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
    ba_fn = make_ba_fn(
        feature_dim=cfg.feature_dim,
        knn_k=cfg.query_nn_k,
        nb_offs=nb_offs,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=max_valid_dist2,
        sdf_scale=cfg.sdf_scale,
        window_size=w,
        ba_bs=cfg.ba_bs,
        lr_pose=cfg.lr_pose,
        lr_map=cfg.lr,
        adam_eps=cfg.adam_eps,
        mlp_leaky=cfg.mlp_leaky_relu,
        mlp_bf16=cfg.mlp_bf16,
        encode_vecs=encode_vecs,
    )

    @jax.jit
    def ba_step(state: StreamState, frame_id) -> StreamState:
        lo = jnp.maximum(frame_id - w + 1, 0)
        poses0 = jax.lax.dynamic_slice(
            state.odom_poses, (lo, 0, 0), (w, 4, 4)
        )
        key, k = jax.random.split(state.key)
        map_state, new_poses, _ = ba_fn(
            state.map_state, state.mlp, state.pool, poses0, lo,
            state.travel_dist, frame_id, cfg.diff_travel_dist_local,
            k, cfg.ba_iters,
        )
        odom_old = state.odom_poses
        odom = jax.lax.dynamic_update_slice(odom_old, new_poses, (lo, 0, 0))
        pool = pl.retransform_coords(state.pool, odom_old, odom)
        # BA corrects the mapping trajectory, not the IESEKF nominal state
        # (the reference keeps the filter untouched as well)
        return state._replace(
            map_state=map_state,
            odom_poses=odom,
            pool=pool,
            last_pose=odom[frame_id],
            key=key,
        )

    return ba_step


class StreamingSlam:
    """Host driver for the zero-readback loop. Mirrors SlamSystem's
    surface (process_frame / finalize) but never reads device state inside
    the loop; call ``sync()`` (or ``finalize``) to materialize results."""

    def __init__(self, cfg: Config, total_frames: int = 1024):
        self.cfg = cfg
        self.total_frames = total_frames
        self.nb_offs = neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha)
        self.encode_vecs, _ = make_encoder(
            num_bands=cfg.pos_encoding_band,
            freq=cfg.pos_encoding_freq,
            base=cfg.pos_encoding_base,
            use_gaussian=cfg.use_gaussian_pe,
            input_dim=cfg.pos_input_dim,
            seed=cfg.seed,
        )
        self.steps = self._make_steps()
        self._ba_step = (
            make_ba_step(cfg, self.nb_offs, self.encode_vecs)
            if cfg.ba_freq_frame > 0
            else None
        )
        self.dataset = SLAMDataset(cfg, tracker=None, min_frames=total_frames)
        self._init_state()
        self.processed = 0
        self.imu_max_rows = IMU_MAX_ROWS

    # factory hooks (overridden by StreamingShardedSlam: sharded map +
    # collective frame step over the same StreamState surface)
    def _make_steps(self):
        return make_frame_step(
            self.cfg, self.nb_offs, self.encode_vecs,
            total_frames=self.total_frames,
        )

    def _init_map_state(self):
        cfg = self.cfg
        return nm.init_map(
            cfg.map_capacity, cfg.map_hash_size, cfg.feature_dim,
            cfg.feature_dim if cfg.color_on else 1,
        )

    def neural_point_count(self) -> int:
        return int(self.state.map_state.count)

    def _init_state(self):
        cfg = self.cfg
        # identical RNG stream to SlamSystem.__init__ (same decoder init +
        # same per-frame batch keys), so the two drivers run the SAME random
        # experiment and the streaming/classic parity test compares
        # implementations, not seeds
        key = jax.random.PRNGKey(cfg.seed)
        key, k1 = jax.random.split(key)
        key, k2, k3 = jax.random.split(key, 3)
        mlp = dec.init_mlp(
            k1, cfg.feature_dim + cfg.position_dim, cfg.geo_mlp_hidden_dim,
            cfg.geo_mlp_level, 1, cfg.mlp_bias_on,
        )
        color_mlp = dec.init_mlp(
            k2, cfg.feature_dim + cfg.position_dim,
            cfg.color_mlp_hidden_dim, cfg.color_mlp_level,
            max(cfg.color_channel, 1), cfg.mlp_bias_on,
        )
        sem_mlp = dec.init_mlp(
            k3, cfg.feature_dim + cfg.position_dim, cfg.sem_mlp_hidden_dim,
            cfg.sem_mlp_level,
            cfg.sem_class_count if cfg.semantic_on else 1, cfg.mlp_bias_on,
        )
        P = np.eye(18, dtype=np.float32)
        P[9:12, 9:12] *= 1e-4
        P[12:15, 12:15] *= 1e-3
        P[15:18, 15:18] *= 1e-4
        rest = np.zeros(12, np.float32)
        rest[9:12] = cfg.init_gravity or [0.0, 0.0, -G_M_S2]
        if cfg.init_bg is not None:
            rest[3:6] = cfg.init_bg
        if cfg.init_ba is not None:
            rest[6:9] = cfg.init_ba
        T = self.total_frames
        from ..mapping import pool as pl

        self.state = StreamState(
            rot=jnp.eye(3, dtype=jnp.float32),
            pos=jnp.zeros(3, jnp.float32),
            rest=jnp.asarray(rest),
            P=jnp.asarray(P),
            last_pose=jnp.eye(4, dtype=jnp.float32),
            odom_poses=jnp.tile(
                jnp.eye(4, dtype=jnp.float32)[None], (T, 1, 1)
            ),
            travel_dist=jnp.zeros((T,), jnp.float32),
            lose_track=jnp.zeros((), bool),
            consec_lose=jnp.zeros((), jnp.int32),
            stop_count=jnp.zeros((), jnp.int32),
            stop_status=jnp.zeros((), bool),
            failed=jnp.zeros((), bool),
            map_state=self._init_map_state(),
            local_map=lm.init_local_map(
                cfg.local_map_capacity, cfg.local_map_hash_size
            ),
            pool=pl.init_pool(
                cfg.pool_capacity,
                cfg.max_scan_points * cfg.all_sample_n,
                max(cfg.color_channel, 1),
            ),
            mlp=mlp,
            color_mlp=color_mlp,
            sem_mlp=sem_mlp,
            key=key,
            losses=jnp.zeros((T, 2), jnp.float32),
            track_iters=jnp.zeros((T,), jnp.int32),
        )

    def precompile(self):
        """Compile every frame-step variant BEFORE frame 0 (track on/off ×
        pool-filter on/off) so no compile ever lands inside the odometry
        loop (round-1 showed a 44 s mid-run stall when the second prep
        variant compiled at frame 9). Runs each variant once on a throwaway
        clone of the initial state (donation consumes the clone)."""
        cfg = self.cfg
        pack = pack_frame_buffers(
            cfg.max_scan_points, self.imu_max_rows,
            np.zeros((0, 3), np.float32), None, None,
            1, cfg.max_range, cfg.iters, 1.0, False,
        )
        for variant, step in self.steps.items():
            clone = jax.tree.map(jnp.copy, self.state)
            out = step(clone, jnp.asarray(pack))
            jax.block_until_ready(out.pos)
            del out
        if cfg.prune_map_on:
            clone = jax.tree.map(jnp.copy, self.state.map_state)
            out = nm.prune_and_rehash(
                clone, cfg.max_prune_certainty, self.state.travel_dist, 0,
                cfg.diff_travel_dist_local, cfg.voxel_size_m,
            )
            jax.block_until_ready(out.count)
            del out

    def seed_pose(self, rot: np.ndarray, pos: np.ndarray, vel=None):
        """Anchor the initial pose (and optionally velocity) before
        frame 0 — the gt[0]-anchoring path (pipeline/slam.py frame-0
        branch)."""
        st = self.state
        rest = np.asarray(st.rest)
        if vel is not None:
            rest = rest.copy()
            rest[0:3] = vel
        self.state = st._replace(
            rot=jnp.asarray(rot, jnp.float32),
            pos=jnp.asarray(pos, jnp.float32),
            rest=jnp.asarray(rest, jnp.float32),
            last_pose=jnp.asarray(
                np.block(
                    [[rot, np.asarray(pos).reshape(3, 1)], [0, 0, 0, 1]]
                ).astype(np.float32)
            ),
        )

    # ----------------------------------------------------------- main step
    def process_frame(
        self,
        frame_id: int,
        points: Optional[np.ndarray] = None,
        imu_window: Optional[np.ndarray] = None,
        point_ts=None,
    ):
        cfg = self.cfg
        d = self.dataset
        if points is None:
            d.read_frame(frame_id)
            imu_window = d.read_imu_window(frame_id)
            points = d._raw_points
            point_ts = d._raw_ts
        else:
            d.read_frame_arrays(points, point_ts)
            points = d._raw_points
            point_ts = d._raw_ts

        # host-side preprocess: adaptive range + pad/truncate
        crop_max_range = cfg.max_range
        if cfg.adaptive_range_on:
            crop_max_range = adaptive_crop_range(points, cfg.max_range)

        p_cap = cfg.max_scan_points
        n = points.shape[0]
        if n > p_cap:
            sel = np.random.default_rng(frame_id).permutation(n)[:p_cap]
            sel.sort()
            points = points[sel]
            point_ts = point_ts[sel] if point_ts is not None else None
            n = p_cap
        if imu_window is not None and len(imu_window) > self.imu_max_rows:
            # static [K,7] bucket (imu_max_rows covers 100-640 Hz IMU
            # at 10 Hz LiDAR); dropping rows silently would corrupt
            # the propagation — warn loudly once per frame
            import warnings

            warnings.warn(
                f"frame {frame_id}: IMU window has {len(imu_window)} "
                f"rows, truncating to imu_max_rows="
                f"{self.imu_max_rows}; raise StreamingSlam."
                f"imu_max_rows to cover your IMU rate",
                RuntimeWarning,
            )

        track = cfg.track_on and frame_id > 0
        filter_now = (frame_id + 1) % cfg.pool_filter_freq == 0
        step = self.steps[(track, filter_now)]

        iters_base = (
            cfg.iters * cfg.init_iter_ratio if frame_id == 0 else cfg.iters
        )
        mlp_scale = 0.0 if frame_id >= cfg.freeze_after_frame else 1.0

        pack = pack_frame_buffers(
            p_cap, self.imu_max_rows,
            points[:, :3],
            point_ts if cfg.deskew else None,
            imu_window,
            frame_id, crop_max_range, iters_base, mlp_scale,
            frame_id > cfg.freeze_after_frame,
        )
        self.state = step(self.state, jnp.asarray(pack))

        # sliding-window BA cadence (separate executable, zero readbacks)
        if (
            self._ba_step is not None
            and frame_id >= cfg.ba_frame
            and (frame_id + 1) % cfg.ba_freq_frame == 0
        ):
            self.state = self._ba_step(
                self.state, jnp.asarray(frame_id, jnp.int32)
            )

        # prune cadence (separate executable, still zero readbacks)
        if (
            cfg.prune_map_on
            and (frame_id + 1) % cfg.prune_freq_frame == 0
        ):
            self.state = self.state._replace(
                map_state=nm.prune_and_rehash(
                    self.state.map_state,
                    cfg.max_prune_certainty,
                    self.state.travel_dist,
                    frame_id,
                    cfg.diff_travel_dist_local,
                    cfg.voxel_size_m,
                )
            )
        self.processed = frame_id + 1

    def block(self):
        """Wait for all enqueued frames WITHOUT reading anything back
        (keeps the pipelined dispatch mode engaged)."""
        jax.block_until_ready(self.state.pos)

    # ------------------------------------------------- checkpoint / resume
    def save_checkpoint(self, path: str):
        """Persist the ENTIRE recurrent device state (IESEKF, odometry
        bookkeeping, neural map, local map, replay pool, decoders, RNG,
        diagnostics) as one compressed npz. The zero-readback design makes
        this trivial and complete: StreamState IS the whole system, so a
        resumed run continues mid-sequence exactly
        (tests/test_streaming.py::test_streaming_checkpoint_resume).
        Analog of utils/tools.py:347-378, which only saves the model at
        the END of a run."""
        self.block()
        leaves = jax.tree_util.tree_leaves(self.state)
        np.savez_compressed(
            path,
            n_leaves=len(leaves),
            processed=self.processed,
            **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)},
        )

    def load_checkpoint(self, path: str):
        """Restore a save_checkpoint snapshot into this (same-config)
        system and continue with process_frame(frame_id, ...) from where
        the saved run stopped."""
        z = np.load(path)
        n = int(z["n_leaves"])
        treedef = jax.tree_util.tree_structure(self.state)
        if treedef.num_leaves != n:
            raise ValueError(
                f"checkpoint has {n} state leaves, this config builds "
                f"{treedef.num_leaves} — config mismatch"
            )
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        self.state = jax.tree_util.tree_unflatten(treedef, leaves)
        self.processed = int(z["processed"])

    # ------------------------------------------------------------- results
    def sync(self) -> dict:
        """Materialize results on host (first device->host read)."""
        st = self.state
        n = self.processed
        out = {
            "odom_poses": np.asarray(st.odom_poses[:n], np.float64),
            "travel_dist": np.asarray(st.travel_dist[:n], np.float64),
            "losses": np.asarray(st.losses[:n]),
            "track_iters": np.asarray(st.track_iters[:n]),
            "failed": bool(st.failed),
            "lose_track": bool(st.lose_track),
            "neural_points": self.neural_point_count(),
        }
        d = self.dataset
        d.odom_poses[:n] = out["odom_poses"]
        d.travel_dist[:n] = out["travel_dist"]
        d.processed_frame = n
        if n:
            d.cur_pose_ref = out["odom_poses"][n - 1]
        return out

    def finalize(self, run_path: str) -> dict:
        os.makedirs(run_path, exist_ok=True)
        out = self.sync()
        result = self.dataset.write_results(run_path)
        result["neural_points"] = out["neural_points"]
        result["failed"] = out["failed"]
        return result
