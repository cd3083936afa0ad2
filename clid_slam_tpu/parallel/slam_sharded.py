"""Sharded-map SLAM loop: the full odometry+mapping pipeline running
against a neural point map partitioned over a device mesh.

This is SURVEY §2.3's target topology made concrete:

- the **neural point map** is spatially sharded (hash ownership) across
  the mesh's ``sp`` axis — capacity and query bandwidth scale with
  devices (parallel/spatial.py);
- **odometry** is latency-bound: the per-frame candidate build is one
  collective (partial-kNN exchange), after which the iterated IESEKF
  solve runs replicated on every chip with zero per-iteration
  collectives (spatial.make_sharded_tracker_fn). The 18x18 float64
  covariance algebra stays on the host exactly like the single-chip
  classic loop;
- **mapping** is the natural data-parallel stage: every Adam iteration's
  feature gathers/updates stay on the owning shard; only the per-batch
  kNN distances and winner payloads cross ICI (spatial.mapping_fn);
- the **raw-point local label map, sampler and replay pool are
  replicated** — they are small (a few MB), rebuilt from scans, and
  replicating them removes every collective from the label path.

Host-driven like pipeline/slam.py's SlamSystem (one jitted call per
stage); the zero-readback fusion of pipeline/streaming.py and this
sharding are orthogonal compositions of the same stage functions.

Reference semantics mirrored: slam.py:135-389 frame loop,
utils/mapper.py:159-459 prep, utils/mapper.py:620-862 mapping.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..mapping import pool as pl
from ..mapping.sampler import sample_rays
from ..models import decoder as dec
from ..models import local_map as lm
from ..models import neural_map as nm
from ..odometry import iekf
from ..ops.encoding import make_encoder
from ..ops.voxel import neighbor_offsets, voxel_down_sample_mask
from ..utils.transforms import crop_mask, transform_points
from . import spatial as sp


class ShardedSlamSystem:
    """SlamSystem equivalent over an n-device mesh (map sharded on 'sp')."""

    def __init__(self, cfg: Config, n_devices: Optional[int] = None,
                 total_frames: int = 1024):
        self.cfg = cfg
        self.mesh = sp.make_spatial_mesh(n_devices)
        self.n_shards = self.mesh.shape["sp"]
        self.total_frames = total_frames
        self.key = jax.random.PRNGKey(cfg.seed)

        self.nb_offs = neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha)
        self.encode_vecs, _ = make_encoder(
            num_bands=cfg.pos_encoding_band,
            freq=cfg.pos_encoding_freq,
            base=cfg.pos_encoding_base,
            use_gaussian=cfg.use_gaussian_pe,
            input_dim=cfg.pos_input_dim,
            seed=cfg.seed,
        )
        self.max_valid_dist2 = (
            3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2
        )

        # per-shard capacity: the global budget divided across the mesh
        # (hash ownership load-balances; keep a 2x slack for imbalance)
        S = self.n_shards
        cap_shard = max(1024, (2 * cfg.map_capacity) // S)
        hash_shard = max(2048, (2 * cfg.map_hash_size) // S)
        self.map_state = sp.init_sharded_map(
            self.mesh, cap_shard, hash_shard, cfg.feature_dim,
            cfg.feature_dim if cfg.color_on else 1,
        )
        self.local_map = lm.init_local_map(
            cfg.local_map_capacity, cfg.local_map_hash_size
        )
        self.pool = pl.init_pool(
            cfg.pool_capacity,
            cfg.max_scan_points * cfg.all_sample_n,
            max(cfg.color_channel, 1),
        )
        self.key, k = jax.random.split(self.key)
        self.mlp = dec.init_mlp(
            k, cfg.feature_dim + cfg.position_dim, cfg.geo_mlp_hidden_dim,
            cfg.geo_mlp_level, 1, cfg.mlp_bias_on,
        )

        (
            self.insert_fn, self.query_fn, self.mapping_fn,
        ) = sp.make_spatial_fns(
            self.mesh,
            feature_dim=cfg.feature_dim,
            knn_k=cfg.query_nn_k,
            nb_offs=self.nb_offs,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=self.max_valid_dist2,
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
            encode_vecs=self.encode_vecs,
        )
        # frame-0 warm-up (iters x init_iter_ratio) needs fresh batches
        # per iteration -- the uncached chunked body resamples every step
        # (the cached body freezes ONE batch per call, right for steady
        # 10-20 iteration frames, wrong for a 400-iteration warm-up)
        _, _, self.mapping_fn_init = sp.make_spatial_fns(
            self.mesh,
            feature_dim=cfg.feature_dim,
            knn_k=cfg.query_nn_k,
            nb_offs=self.nb_offs,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=self.max_valid_dist2,
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
            encode_vecs=self.encode_vecs,
            batch_shard="uncached",
        )
        cached_body = iekf.make_cached_update_fn(
            knn_k=cfg.query_nn_k,
            n_cand=cfg.track_n_cand or max(16, cfg.query_nn_k * 2),
            nb_offs=self.nb_offs,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=self.max_valid_dist2,
            sdf_scale=cfg.sdf_scale,
            min_grad_norm=cfg.reg_min_grad_norm,
            max_grad_norm=cfg.reg_max_grad_norm,
            min_nn_count=cfg.track_mask_query_nn_k,
            max_iteration=cfg.reg_iter_n,
            term_thre_deg=cfg.reg_term_thre_deg,
            term_thre_m=cfg.reg_term_thre_m,
            mlp_leaky=cfg.mlp_leaky_relu,
            mlp_bf16=cfg.mlp_bf16,
            encode_vecs=self.encode_vecs,
            weighted_first=cfg.weighted_first,
            layer_norm=cfg.layer_norm_on,
            max_sdf_std=cfg.surface_sample_range_m * cfg.max_sdf_std_ratio,
            stagnation_iter=cfg.stagnation_iter,
            info_scale=cfg.tracker_info_scale,
        )
        self.tracker_update = sp.make_sharded_tracker_fn(
            self.mesh, cached_body,
            nb_offs=self.nb_offs,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=self.max_valid_dist2,
            layer_norm=cfg.layer_norm_on,
        )
        self.certainty_fn = sp.make_sharded_certainty_fn(
            self.mesh,
            resolution=cfg.voxel_size_m,
            max_valid_dist2=3.0 * (2.0 * cfg.voxel_size_m) ** 2,
        )
        self.tracker = iekf.IEKF(
            iekf.IEKFConfig(
                measurement_noise_covariance=cfg.measurement_noise_covariance,
                bias_noise_covariance=cfg.bias_noise_covariance,
                max_iteration=cfg.reg_iter_n,
                term_thre_deg=cfg.reg_term_thre_deg,
                term_thre_m=cfg.reg_term_thre_m,
            ),
            init_bg=cfg.init_bg,
            init_ba=cfg.init_ba,
            init_grav=cfg.init_gravity,
        )

        self._sampler = jax.jit(partial(
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
        ))

        self.odom_poses = np.tile(np.eye(4), (total_frames, 1, 1))
        self.travel_dist = np.zeros(total_frames)
        self.travel_dist_dev = jnp.zeros((total_frames,), jnp.float32)
        self.last_pose = np.eye(4)
        self.lose_track = False
        self.failed = False
        self.adaptive_iter_offset = 0
        self.processed = 0

    # ----------------------------------------------------------------- frame
    def process_frame(self, frame_id: int, points: np.ndarray,
                      imu_window=None):
        cfg = self.cfg
        # host preprocess: pad to the static bucket + device masks
        p_cap = cfg.max_scan_points
        n = min(len(points), p_cap)
        buf = np.zeros((p_cap, 3), np.float32)
        buf[:n] = points[:n, :3]
        mask = np.zeros(p_cap, bool)
        mask[:n] = True
        pts = jnp.asarray(buf)
        pmask = jnp.asarray(mask) & crop_mask(
            pts, cfg.min_z, cfg.max_z, cfg.min_range, cfg.max_range
        )
        train_mask = voxel_down_sample_mask(
            pts, pmask, cfg.vox_down_m, cfg.map_hash_size
        )

        # IMU propagation on host float64 (classic-loop structure)
        if frame_id > 0 and imu_window is not None:
            for row in imu_window:
                self.tracker.predict(row[1:4], row[4:7], float(row[0]))

        if frame_id > 0 and cfg.track_on:
            src_mask = voxel_down_sample_mask(
                pts, train_mask, cfg.source_vox_down_m, cfg.map_hash_size
            )
            S_cap = cfg.max_source_points
            n_src = int(jnp.sum(src_mask.astype(jnp.int32)))
            (src_idx,) = jnp.nonzero(src_mask, size=S_cap, fill_value=0)
            src_pts = pts[src_idx]
            smask = jnp.arange(S_cap) < n_src
            x = self.tracker.x
            rest0 = np.concatenate([x.vel, x.bg, x.ba, x.grav])
            rot, pos, rest, P, ok, _ = self.tracker_update(
                self.map_state, self.mlp, src_pts, smask,
                jnp.asarray(x.rot, jnp.float32),
                jnp.asarray(x.pos, jnp.float32),
                jnp.asarray(rest0, jnp.float32),
                jnp.asarray(self.tracker.P, jnp.float32),
                self.travel_dist_dev, frame_id,
                cfg.diff_travel_dist_local,
            )
            rot = np.asarray(rot, np.float64)
            u, _, vt = np.linalg.svd(rot)
            rot = u @ np.diag([1.0, 1.0, np.linalg.det(u @ vt)]) @ vt
            rest = np.asarray(rest, np.float64)
            self.tracker.x = iekf.IEKFState(
                rot=rot, pos=np.asarray(pos, np.float64),
                vel=rest[0:3], bg=rest[3:6], ba=rest[6:9], grav=rest[9:12],
            )
            self.tracker.P = np.asarray(P, np.float64)
            self.lose_track = not bool(ok)
            pose = self.tracker.x.pose_matrix()
        else:
            pose = self.tracker.x.pose_matrix()

        tran = np.linalg.norm(
            (np.linalg.inv(self.last_pose) @ pose)[:3, 3]
        )
        self.failed |= tran > cfg.surface_sample_range_m * 40.0
        self.odom_poses[frame_id] = pose
        self.travel_dist[frame_id] = (
            self.travel_dist[max(frame_id - 1, 0)] + tran
        )
        self.travel_dist_dev = self.travel_dist_dev.at[frame_id].set(
            float(self.travel_dist[frame_id])
        )
        self.last_pose = pose

        if not self.lose_track:
            self._map_prep(frame_id, pts, train_mask, pose)
            self._map_opt(frame_id)
        self.processed = frame_id + 1

    def _map_prep(self, frame_id, pts, train_mask, pose):
        cfg = self.cfg
        pose_j = jnp.asarray(pose, jnp.float32)
        world = transform_points(pts, pose_j)
        filter_now = (frame_id + 1) % cfg.pool_filter_freq == 0
        self.local_map = lm.update_local_map(
            self.local_map, pose_j[:3, 3], world, train_mask,
            cfg.local_voxel_size_m, cfg.local_map_size,
            crop_now=filter_now,
        )
        self.key, k = jax.random.split(self.key)
        batch = self._sampler(
            k, pts, train_mask, pose_j, self.local_map,
            cfg.local_voxel_size_m,
        )
        coords_global = transform_points(batch.coords, pose_j)
        surf_rows = (1 + cfg.surface_sample_n) * pts.shape[0]
        upd_sel = batch.mask & (
            jnp.abs(batch.sdf_label)
            < cfg.surface_sample_range_m * cfg.map_surface_ratio
        )
        self.map_state, _ = self.insert_fn(
            self.map_state, coords_global[:surf_rows], upd_sel[:surf_rows],
            self.travel_dist_dev, frame_id, cfg.diff_travel_dist_local,
        )
        if filter_now:
            self.pool = pl.filter_pool(
                self.pool, pose_j[:3, 3], cfg.window_radius
            )
        self.adaptive_iter_offset = 0
        if cfg.bs_new_sample > 0:
            cert = self.certainty_fn(self.map_state, coords_global)
            is_new = (
                (cert < cfg.new_certainty_thre)
                & (jnp.abs(batch.sdf_label)
                   < cfg.surface_sample_range_m * 3.0)
                & batch.mask
            )
            if cfg.adaptive_iters:
                cur = max(int(jnp.sum(batch.mask.astype(jnp.int32))), 1)
                ratio = float(jnp.sum(is_new.astype(jnp.int32))) / cur
                if ratio < cfg.new_sample_ratio_less:
                    self.adaptive_iter_offset = -5
                elif ratio > cfg.new_sample_ratio_more:
                    self.adaptive_iter_offset = 5
                    if (frame_id > cfg.freeze_after_frame
                            and ratio > cfg.new_sample_ratio_restart):
                        self.adaptive_iter_offset = 10
        else:
            is_new = jnp.zeros_like(batch.mask)
        self.key, k2 = jax.random.split(self.key)
        self.pool = pl.append_samples(
            self.pool, coords_global, batch.sdf_label, batch.weight,
            batch.mask, frame_id, is_new, key=k2,
        )

    def _map_opt(self, frame_id):
        cfg = self.cfg
        iters = (
            cfg.iters * cfg.init_iter_ratio if frame_id == 0 else cfg.iters
        )
        iters = max(1, iters + self.adaptive_iter_offset)
        mlp_scale = 0.0 if frame_id >= cfg.freeze_after_frame else 1.0
        self.key, k = jax.random.split(self.key)
        map_fn = self.mapping_fn if frame_id > 0 else self.mapping_fn_init
        self.map_state, self.mlp, self._last_losses = map_fn(
            self.map_state, self.mlp, self.pool, self.travel_dist_dev,
            frame_id, cfg.diff_travel_dist_local, k, iters, mlp_scale,
        )

    def neural_point_count(self) -> int:
        return sp.total_count(self.map_state)
