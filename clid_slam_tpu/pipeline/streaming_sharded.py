"""Zero-readback streaming SLAM over a SHARDED neural map — the
multi-chip production path (VERDICT r4 item 3).

Composes the two previously-separate designs:

- ``pipeline/streaming.py``: the whole recurrent SLAM state lives on
  device and one frame is ONE jitted call — no host readbacks inside the
  loop (the dispatch pathology its docstring documents: a single readback
  degrades dispatch 0.07 -> 24 ms on a remote-attached runtime);
- ``parallel/spatial.py``: the neural point map is spatially sharded
  (hash ownership) across the mesh's ``sp`` axis, with the partial-kNN
  collective exchange for queries, shard-local inserts, the collective
  candidate build + replicated dense IESEKF solve for tracking, and the
  DP x SP cached mapping loop (one collective probe per frame +
  per-iteration feature-payload psum_scatter).

The fusion is structural, not a rewrite: the frame step is one jitted
function whose body calls the spatial collective building blocks —
XLA compiles everything (collectives included) into ONE executable, so
a frame is still a single dispatch. The filter, odometry bookkeeping,
raw-point local map, sampler, and replay pool are replicated (they are
small and rebuilt from scans); only the neural map carries a shard axis.

Reference topology this realizes: SURVEY §2.3 — "odometry pinned
(replicated dense solve), mapping scaled pod-wide, map-block sharding
with collective halo exchange".
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..mapping import pool as pl
from ..mapping.sampler import sample_rays
from ..models import decoder as dec
from ..models import local_map as lm
from ..models import neural_map as nm
from ..odometry import iekf
from ..ops.encoding import make_encoder
from ..ops.voxel import neighbor_offsets, voxel_down_sample_mask
from ..utils.transforms import adaptive_crop_range, crop_mask, transform_points
from . import streaming as stream
from ..parallel import spatial as sp

StreamState = stream.StreamState
G_M_S2 = iekf.G_M_S2


def _unjit(fn):
    """Peel a jax.jit wrapper so nested calls don't re-enter jit with
    donation annotations (donation inside a traced call is a no-op that
    warns)."""
    return getattr(fn, "__wrapped__", fn)


def make_sharded_frame_step(
    cfg: Config, mesh, nb_offs, encode_vecs, *, total_frames: int
):
    """Build the fused sharded frame-step executables, keyed like
    streaming.make_frame_step by (track, filter_pool_now)."""
    axis = "sp"
    S_mesh = mesh.shape[axis]
    max_valid_dist2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
    max_sdf_std = cfg.surface_sample_range_m * cfg.max_sdf_std_ratio
    S = cfg.max_source_points
    window = cfg.diff_travel_dist_local

    n_cand = cfg.track_n_cand or max(16, cfg.query_nn_k * 2)
    cached_body = iekf.make_cached_update_fn(
        knn_k=cfg.query_nn_k,
        n_cand=n_cand,
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
    tracker_update = _unjit(sp.make_sharded_tracker_fn(
        mesh, cached_body,
        nb_offs=nb_offs,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=max_valid_dist2,
        layer_norm=cfg.layer_norm_on,
    ))
    certainty_fn = _unjit(sp.make_sharded_certainty_fn(
        mesh,
        resolution=cfg.voxel_size_m,
        max_valid_dist2=3.0 * (2.0 * cfg.voxel_size_m) ** 2,
    ))

    spatial_kw = dict(
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
        encode_vecs=encode_vecs,
    )
    insert_fn, _, mapping_fn = sp.make_spatial_fns(mesh, **spatial_kw)
    insert_fn = _unjit(insert_fn)
    mapping_fn = _unjit(mapping_fn)
    # frame-0 warm-up needs fresh batches per iteration (see
    # parallel/slam_sharded.py rationale)
    _, _, mapping_fn_init = sp.make_spatial_fns(
        mesh, **spatial_kw, batch_shard="uncached"
    )
    mapping_fn_init = _unjit(mapping_fn_init)

    sampler = partial(
        sample_rays,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_front_n=cfg.free_front_n,
        free_behind_n=cfg.free_behind_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        max_range=cfg.max_range,
        dist_weight_on=cfg.dist_weight_on,
        dist_weight_scale=cfg.dist_weight_scale,
        pin_mode=cfg.use_pin_mapper,
        behind_dropoff_on=cfg.behind_dropoff_on,
        incidence_label_on=cfg.incidence_label_on,
        incidence_min_factor=cfg.incidence_min_factor,
        incidence_degenerate_factor=cfg.incidence_degenerate_factor,
        free_behind_weight=cfg.resolved_free_behind_weight(),
    )

    def _orthonormalize(R):
        a = R[:, 0] / jnp.linalg.norm(R[:, 0])
        b = R[:, 1] - jnp.dot(a, R[:, 1]) * a
        b = b / jnp.linalg.norm(b)
        c = jnp.cross(a, b)
        return jnp.stack([a, b, c], axis=1)

    def make_step(track: bool, filter_pool_now: bool):
        def step(
            state: StreamState,
            frame_id,
            points,  # [P,3] sensor frame, padded
            pmask,  # [P]
            point_ts,  # [P] (unused: deskew not wired in the sharded path)
            imu_rows,  # [K,7]
            imu_count,  # i32
            crop_max_range,  # f32
            iters_base,  # i32
            mlp_lr_scale,  # f32
            allow_restart,  # bool
        ) -> StreamState:
            del point_ts
            pmask = pmask & crop_mask(
                points, cfg.min_z, cfg.max_z, cfg.min_range, crop_max_range
            )
            scale = crop_max_range / cfg.max_range
            train_mask = voxel_down_sample_mask(
                points, pmask, scale * cfg.vox_down_m, cfg.map_hash_size
            )

            rot, pos = state.rot, state.pos
            rest, Pm = state.rest, state.P
            odom_poses = state.odom_poses
            travel_dist = state.travel_dist
            lose_track = state.lose_track
            consec_lose = state.consec_lose
            stop_count, stop_status = state.stop_count, state.stop_status
            failed = state.failed
            track_iters = state.track_iters

            if track:
                Q = jnp.zeros((12, 12), jnp.float32)
                Q = Q.at[0:3, 0:3].set(
                    cfg.measurement_noise_covariance * jnp.eye(3)
                )
                Q = Q.at[3:6, 3:6].set(
                    cfg.measurement_noise_covariance * jnp.eye(3)
                )
                Q = Q.at[6:9, 6:9].set(cfg.bias_noise_covariance * jnp.eye(3))
                Q = Q.at[9:12, 9:12].set(
                    cfg.bias_noise_covariance * jnp.eye(3)
                )
                vel, bg, ba, grav = (
                    rest[0:3], rest[3:6], rest[6:9], rest[9:12]
                )
                rot, pos, vel, bg, ba, grav, Pm = iekf.device_predict_imu(
                    rot, pos, vel, bg, ba, grav, Pm, Q, imu_rows, imu_count
                )
                rest = jnp.concatenate([vel, bg, ba, grav])

                src_mask = voxel_down_sample_mask(
                    points, train_mask, scale * cfg.source_vox_down_m,
                    cfg.map_hash_size,
                )
                if cfg.track_max_range > 0:
                    src_mask = src_mask & (
                        jnp.linalg.norm(points, axis=-1)
                        <= cfg.track_max_range
                    )
                n_src = jnp.sum(src_mask.astype(jnp.int32))
                (src_idx,) = jnp.nonzero(src_mask, size=S, fill_value=0)
                smask = jnp.arange(S) < n_src
                src_pts = points[src_idx]

                rot, pos, rest, Pm, ok, n_iter = tracker_update(
                    state.map_state, state.mlp, src_pts, smask,
                    rot, pos, rest, Pm, travel_dist, frame_id, window,
                )
                rot = _orthonormalize(rot)
                track_iters = track_iters.at[frame_id].set(n_iter)

                pose = (
                    jnp.eye(4, dtype=jnp.float32)
                    .at[:3, :3].set(rot)
                    .at[:3, 3].set(pos)
                )
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

            # ---- map prep (prep.make_prep_fn structure, insert sharded)
            valid_mapping = ~lose_track & ~stop_status
            use_mask = train_mask & valid_mapping
            key, k_prep = jax.random.split(state.key)
            origin = pose[:3, 3]
            world_pts = transform_points(points, pose)
            local_map = state.local_map
            if not cfg.use_pin_mapper:
                local_map = lm.update_local_map(
                    local_map, origin, world_pts, use_mask,
                    cfg.local_voxel_size_m, cfg.local_map_size,
                    crop_now=filter_pool_now,
                )
            batch = sampler(
                k_prep, points, use_mask, pose, local_map,
                cfg.local_voxel_size_m,
            )
            coords_global = transform_points(batch.coords, pose)
            upd_sel = batch.mask & (
                jnp.abs(batch.sdf_label)
                < cfg.surface_sample_range_m * cfg.map_surface_ratio
            )
            surf_rows = (1 + cfg.surface_sample_n) * points.shape[0]
            map_state, _ = insert_fn(
                state.map_state, coords_global[:surf_rows],
                upd_sel[:surf_rows], travel_dist, frame_id, window,
            )
            pool = state.pool
            if filter_pool_now:
                pool = pl.filter_pool(pool, origin, cfg.window_radius)
            if cfg.bs_new_sample > 0:
                cert = certainty_fn(map_state, coords_global)
                is_new = (
                    (cert < cfg.new_certainty_thre)
                    & (jnp.abs(batch.sdf_label)
                       < cfg.surface_sample_range_m * 3.0)
                    & batch.mask
                )
            else:
                is_new = jnp.zeros_like(batch.mask)
            key, k_over = jax.random.split(key)
            pool = pl.append_samples(
                pool, coords_global, batch.sdf_label, batch.weight,
                batch.mask, frame_id, is_new, key=k_over,
            )

            # ---- adaptive iteration offset (device scalars)
            iters = iters_base
            if cfg.adaptive_iters and cfg.bs_new_sample > 0:
                new_n = jnp.sum(is_new.astype(jnp.int32))
                cur_n = jnp.maximum(
                    jnp.sum(batch.mask.astype(jnp.int32)), 1
                )
                ratio = new_n / cur_n
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
            map_fn = mapping_fn if track else mapping_fn_init
            map_state, mlp, losses2 = map_fn(
                map_state, state.mlp, pool, travel_dist, frame_id, window,
                k_map, iters, mlp_lr_scale,
            )
            losses = state.losses.at[frame_id].set(losses2)

            return StreamState(
                rot=rot,
                pos=pos,
                rest=rest,
                P=Pm,
                last_pose=last_pose,
                odom_poses=odom_poses,
                travel_dist=travel_dist,
                lose_track=lose_track,
                consec_lose=consec_lose,
                stop_count=stop_count,
                stop_status=stop_status,
                failed=failed,
                map_state=map_state,
                local_map=local_map,
                pool=pool,
                mlp=mlp,
                color_mlp=state.color_mlp,
                sem_mlp=state.sem_mlp,
                key=key,
                losses=losses,
                track_iters=track_iters,
            )

        return stream.pack_adapter(
            step, cfg.max_scan_points, stream.IMU_MAX_ROWS
        )

    return {
        (tr, fp): make_step(tr, fp)
        for tr in (False, True)
        for fp in (False, True)
    }


class StreamingShardedSlam(stream.StreamingSlam):
    """StreamingSlam whose neural map is sharded over an ``sp`` mesh.

    Same host surface (seed_pose / precompile / process_frame / block /
    sync / checkpoint) — only the map init and the frame-step factory
    differ. One frame remains ONE dispatch; all collectives live inside
    the compiled step."""

    def __init__(self, cfg: Config, n_devices: Optional[int] = None,
                 total_frames: int = 1024):
        self.mesh = sp.make_spatial_mesh(n_devices)
        self.n_shards = self.mesh.shape["sp"]
        super().__init__(cfg, total_frames=total_frames)

    # -- overridden factory hooks --------------------------------------
    def _make_steps(self):
        return make_sharded_frame_step(
            self.cfg, self.mesh, self.nb_offs, self.encode_vecs,
            total_frames=self.total_frames,
        )

    def _init_map_state(self):
        cfg = self.cfg
        S = self.n_shards
        cap_shard = max(1024, (2 * cfg.map_capacity) // S)
        hash_shard = max(2048, (2 * cfg.map_hash_size) // S)
        return sp.init_sharded_map(
            self.mesh, cap_shard, hash_shard, cfg.feature_dim,
            cfg.feature_dim if cfg.color_on else 1,
        )

    def neural_point_count(self) -> int:
        return sp.total_count(self.state.map_state)

    def sync(self) -> dict:
        out = super().sync()
        out["neural_points"] = self.neural_point_count()
        return out
