"""Fused per-frame map-preparation step: ONE jitted device call.

Covers the reference Mapper.process_frame pipeline (utils/mapper.py:159-459)
— local raw-map update, ray sampling with region-specific labels, neural
point insertion from near-surface samples, replay-pool window filtering +
append, and novelty flags for adaptive iteration — as a single XLA
executable with donated map/pool buffers. The reference makes dozens of
kernel launches here; a latency-sensitive odometry loop wants exactly one.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import local_map as lm
from ..models import neural_map as nm
from ..mapping import pool as pl
from ..mapping.sampler import sample_rays
from ..utils.transforms import transform_points


class PrepResult(NamedTuple):
    map_state: nm.NeuralMapState
    local_map: lm.LocalMapState
    pool: pl.ReplayPool
    new_point_ratio: jnp.ndarray
    new_sample_count: jnp.ndarray
    cur_sample_count: jnp.ndarray


def make_prep_fn(
    *,
    resolution: float,
    local_resolution: float,
    local_map_size: float,
    window_radius: float,
    surface_sample_range_m: float,
    surface_sample_n: int,
    free_front_n: int,
    free_behind_n: int,
    free_sample_begin_ratio: float,
    free_sample_end_dist_m: float,
    max_range: float,
    dist_weight_on: bool,
    dist_weight_scale: float,
    map_surface_ratio: float,
    from_sample_points: bool,
    new_certainty_thre: float,
    novelty_on: bool,
    novelty_mode: str = "travel",
    filter_pool_now: bool = True,
    pin_mode: bool = False,
    behind_dropoff_on: bool = False,
    incidence_label_on: bool = False,
    incidence_min_factor: float = 0.1,
    incidence_degenerate_factor: float = 1.0,
    free_behind_weight: float = 1.0,
    as_body: bool = False,
):
    """``as_body=True`` returns the unjitted function for fusion into a
    larger jitted step (pipeline/streaming.py); otherwise a standalone
    jitted executable with donated map/local/pool buffers."""
    one_cell_mvd2 = 3.0 * (2.0 * resolution) ** 2

    def prep(
        map_state: nm.NeuralMapState,
        local_map: lm.LocalMapState,
        pool: pl.ReplayPool,
        key,
        points,  # [P,3] sensor/IMU frame
        mask,  # [P]
        pose,  # [4,4] f32
        travel_dist,  # [T]
        frame_id,
        diff_travel_dist_local,
        colors=None,  # [P,C] per-point color/intensity
        sem_labels=None,  # [P] i32
    ) -> PrepResult:
        key, overflow_key = jax.random.split(key)
        origin = pose[:3, 3]
        world_pts = transform_points(points, pose)

        if not pin_mode:
            # PIN mode skips the raw-point local map entirely
            # (utils/mapper.py:179-184 gated on use_pin_mapper).
            # The O(capacity) crop+rehash runs on the pool-filter cadence;
            # other frames append-only (see models/local_map.py).
            local_map = lm.update_local_map(
                local_map, origin, world_pts, mask, local_resolution,
                local_map_size, crop_now=filter_pool_now,
            )

        batch = sample_rays(
            key,
            points,
            mask,
            pose,
            local_map,
            local_resolution,
            surface_sample_range_m=surface_sample_range_m,
            surface_sample_n=surface_sample_n,
            free_front_n=free_front_n,
            free_behind_n=free_behind_n,
            free_sample_begin_ratio=free_sample_begin_ratio,
            free_sample_end_dist_m=free_sample_end_dist_m,
            max_range=max_range,
            dist_weight_on=dist_weight_on,
            dist_weight_scale=dist_weight_scale,
            pin_mode=pin_mode,
            behind_dropoff_on=behind_dropoff_on,
            incidence_label_on=incidence_label_on,
            incidence_min_factor=incidence_min_factor,
            incidence_degenerate_factor=incidence_degenerate_factor,
            free_behind_weight=free_behind_weight,
            colors=colors,
            sem_labels=sem_labels,
        )
        coords_global = transform_points(batch.coords, pose)

        if from_sample_points:
            upd_sel = batch.mask & (
                jnp.abs(batch.sdf_label)
                < surface_sample_range_m * map_surface_ratio
            )
            upd_pts = coords_global
            # the sampler's part-major layout puts endpoint + near-surface
            # samples in the first (1+surface_sample_n)*P rows; freespace
            # samples carry |label| >= 2*sigma and can never pass the gate
            # when the gate sits below that, so the insert probe only needs
            # the surface block (262k -> 164k rows at bench shapes)
            if map_surface_ratio <= 2.0:
                surf_rows = (1 + surface_sample_n) * points.shape[0]
                upd_sel = upd_sel[:surf_rows]
                upd_pts = upd_pts[:surf_rows]
        else:
            upd_sel = mask
            upd_pts = world_pts
        map_state, new_ratio = nm.insert_points(
            map_state,
            upd_pts,
            upd_sel,
            resolution,
            travel_dist,
            frame_id,
            diff_travel_dist_local,
        )

        if filter_pool_now:
            pool = pl.filter_pool(pool, origin, window_radius)

        if novelty_on:
            if novelty_mode == "fast":
                # two-gather own-cell path (see query_certainty_own_cell)
                cert = nm.query_certainty_own_cell(
                    map_state, coords_global, resolution
                )
            else:
                cert = nm.query_certainty_max(
                    map_state, coords_global, resolution, one_cell_mvd2
                )
            is_new = (
                (cert < new_certainty_thre)
                & (jnp.abs(batch.sdf_label) < surface_sample_range_m * 3.0)
                & batch.mask
            )
        else:
            is_new = jnp.zeros_like(batch.mask)

        pool = pl.append_samples(
            pool,
            coords_global,
            batch.sdf_label,
            batch.weight,
            batch.mask,
            frame_id,
            is_new,
            color=batch.color if colors is not None else None,
            sem=batch.sem if sem_labels is not None else None,
            key=overflow_key,
        )
        return PrepResult(
            map_state,
            local_map,
            pool,
            new_ratio,
            jnp.sum(is_new.astype(jnp.int32)),
            jnp.sum(batch.mask.astype(jnp.int32)),
        )

    if as_body:
        return prep
    return partial(jax.jit, donate_argnums=(0, 1, 2))(prep)
