"""Raw-point local map + region-specific SDF label estimation.

The CLID-SLAM novelty: a second, non-neural voxel-hashed point map at a
finer resolution supplies SDF training labels — point-to-plane distance
where a local 4-NN plane fit succeeds, 1-NN distance otherwise
(model/local_point_cloud_map.py:11-201).

TPU-native design mirrors models/neural_map.py: fixed-capacity position
slab with a sentinel row, power-of-two hash table, masked static shapes.
``update_local_map`` fuses the reference's insert + radius-crop + rehash
(model/local_point_cloud_map.py:40-72) into one jitted O(C) pass using a
cumsum compaction instead of boolean fancy-indexing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.plane_fit import fit_plane_masked
from ..ops.voxel import (
    grid_coords,
    neighbor_offsets,
    voxel_down_sample_mask,
    voxel_hash,
)

# 7-cell probe: num_nei_cells=1, alpha=0.2 (model/local_point_cloud_map.py:74-88)
LOCAL_NB_OFFSETS = neighbor_offsets(1, 0.2)


def local_max_valid_range(resolution: float) -> float:
    """model/local_point_cloud_map.py:89."""
    return 1.732 * 2.0 * resolution


_EMPTY_POS = 1e9  # mirror sentinel: empty buckets sit "infinitely far away"


class LocalMapState(NamedTuple):
    """``hash_mirror`` is the query accelerator (same trick as
    models/neural_map.py): a [H,4] float32 companion of the hash table
    holding each bucket occupant's (x, y, z, pad), so the 7-cell label
    probe is ONE row-gather — XLA's TPU gather costs ~10 ns per row
    regardless of width, so one 16-byte AoS row beats the idx + positions
    gather pair 2:1 (scripts/profile_gather.py)."""

    positions: jnp.ndarray  # [C+1, 3] f32, sentinel last row
    count: jnp.ndarray  # scalar i32
    hash_table: jnp.ndarray  # [H] i32, -1 empty
    hash_mirror: jnp.ndarray  # [H, 4] f32 (x, y, z, pad)


def init_local_map(capacity: int, hash_size: int) -> LocalMapState:
    return LocalMapState(
        positions=jnp.zeros((capacity + 1, 3), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        hash_table=jnp.full((hash_size,), -1, jnp.int32),
        hash_mirror=jnp.full((hash_size, 4), _EMPTY_POS, jnp.float32),
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("crop_now",))
def update_local_map(
    state: LocalMapState,
    sensor_position: jnp.ndarray,  # [3]
    points: jnp.ndarray,  # [M,3] world frame
    mask: jnp.ndarray,  # [M]
    resolution,
    map_size,
    crop_now: bool = True,
) -> LocalMapState:
    """Insert new surface points (only into empty voxels, matching
    model/local_point_cloud_map.py:40-56), then radius-crop to ``map_size``
    around the sensor and rebuild the hash (:58-72).

    ``crop_now=False`` skips the O(capacity) compaction + full rehash and
    only appends (points beyond ``map_size`` are still rejected at insert).
    The reference crops every update; cropping on a 10-frame cadence is
    equivalent for queries — stale far points are real surface points that
    no within-range query reaches — and only bounds memory more lazily.
    On TPU the full rebuild is the dominant prep cost (O(capacity) scatter
    per frame), so the steady-state path appends and crops lazily."""
    cap = state.positions.shape[0] - 1
    hsize = state.hash_table.shape[0]

    mask = voxel_down_sample_mask(points, mask, resolution, hsize)
    d_in = jnp.linalg.norm(points - sensor_position, axis=-1)
    g = grid_coords(points, resolution)
    h = voxel_hash(g, hsize)
    empty = state.hash_table[h] == -1
    insert = mask & empty & (d_in < map_size)

    offs = jnp.cumsum(insert.astype(jnp.int32)) - 1
    new_idx = state.count + offs
    insert = insert & (new_idx < cap)
    slot = jnp.where(insert, new_idx, cap)
    positions = state.positions.at[slot].set(points)
    positions = positions.at[cap].set(0.0)
    count = jnp.minimum(state.count + jnp.sum(insert.astype(jnp.int32)), cap)

    if not crop_now:
        # append-only: scatter just the new rows into table + mirror
        hash_slot = jnp.where(insert, h, hsize)
        hash_table = state.hash_table.at[hash_slot].set(
            new_idx.astype(jnp.int32), mode="drop"
        )
        mir_rows = jnp.concatenate(
            [points, jnp.zeros((points.shape[0], 1), jnp.float32)], axis=1
        )
        hash_mirror = state.hash_mirror.at[hash_slot].set(
            mir_rows, mode="drop"
        )
        return LocalMapState(positions, count, hash_table, hash_mirror)

    # radius crop + compaction + rehash (one O(C) pass)
    live = jnp.arange(cap + 1) < count
    d = jnp.linalg.norm(positions - sensor_position, axis=-1)
    keep = live & (d < map_size)
    new_pos_idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot2 = jnp.where(keep, new_pos_idx, cap)
    compacted = jnp.zeros_like(positions)
    compacted = compacted.at[slot2].set(positions)
    compacted = compacted.at[cap].set(0.0)
    new_count = jnp.sum(keep.astype(jnp.int32))

    g2 = grid_coords(compacted, resolution)
    h2 = voxel_hash(g2, hsize)
    live2 = jnp.arange(cap + 1) < new_count
    slot2h = jnp.where(live2, h2, hsize)
    hash_table = jnp.full((hsize,), -1, jnp.int32)
    hash_table = hash_table.at[slot2h].set(
        jnp.arange(cap + 1, dtype=jnp.int32), mode="drop"
    )
    hash_mirror = jnp.full((hsize, 4), _EMPTY_POS, jnp.float32)
    hash_mirror = hash_mirror.at[slot2h].set(
        jnp.concatenate(
            [compacted, jnp.zeros((cap + 1, 1), jnp.float32)], axis=1
        ),
        mode="drop",
    )
    return LocalMapState(compacted, new_count, hash_table, hash_mirror)


def region_specific_sdf(
    state: LocalMapState,
    points: jnp.ndarray,  # [N,3] world frame
    resolution,
    eta_threshold: float = 0.2,
    residual_threshold: float = 0.1,
    with_normal: bool = False,
):
    """Region-specific |SDF| labels (model/local_point_cloud_map.py:98-152).

    For each query: probe the 7-cell neighborhood, take the 4 nearest raw
    map points; where a valid plane fits (eta + residual gates), the label
    is point-to-plane distance, else the 1-NN distance. Returns
    (sdf_abs [N], surface_mask [N]) where surface_mask = "has at least one
    neighbor in range"; with ``with_normal=True`` additionally returns
    (normal [N,3] unit plane normal, fit_success [N]) — used by the
    incidence-corrected freespace labels (mapping/sampler.py, r5).
    """
    hsize = state.hash_table.shape[0]
    maxr = local_max_valid_range(resolution)

    g = grid_coords(points, resolution)
    cells = g[:, None, :] + LOCAL_NB_OFFSETS[None, :, :]
    h = voxel_hash(cells, hsize)
    mir = state.hash_mirror[h]  # [N,7,4] — the ONE probe gather
    nb = mir[..., :3]
    dist = jnp.linalg.norm(nb - points[:, None, :], axis=-1)
    # empties carry the far sentinel; any REAL occupant of a probed cell is
    # within ~2.45·res < maxr, so clipping at maxr exactly reproduces the
    # old idx-gated distances
    dist = jnp.minimum(dist, maxr)

    # 4 nearest as a RANK MASK over the 7 cells — no top_k, no
    # take_along_axis (minor-dim gathers are the TPU slow path; the r3
    # trace put 13 ms/frame in this function's three selection gathers).
    # Duplicate buckets (two probed cells hashing together surface the
    # same occupant at the SAME distance) keep their first occurrence:
    # later equal-distance copies are pushed to maxr before ranking.
    iot = jnp.arange(LOCAL_NB_OFFSETS.shape[0], dtype=jnp.int32)
    dup = (
        (h[:, None, :] == h[:, :, None])
        & (iot[None, None, :] < iot[None, :, None])
        & (dist[:, None, :] == dist[:, :, None])
    )
    dist = jnp.where(jnp.any(dup, axis=-1), maxr, dist)
    before = (dist[:, None, :] < dist[:, :, None]) | (
        (dist[:, None, :] == dist[:, :, None])
        & (iot[None, None, :] < iot[None, :, None])
    )
    rank = jnp.sum(before.astype(jnp.int32), axis=-1)  # [N,7]
    real = dist < maxr
    sel4 = (rank < 4) & real

    nn1 = jnp.min(dist, axis=-1)  # 1-NN distance
    valid_fit = jnp.sum(real.astype(jnp.int32), axis=-1) >= 4
    normal, constant, fit_success = fit_plane_masked(
        nb, sel4, eta_threshold, residual_threshold
    )
    fit_success = fit_success & valid_fit

    plane_dist = jnp.abs(jnp.sum(normal * points, axis=-1) + constant)
    sdf_abs = jnp.where(fit_success, plane_dist, nn1)
    surface_mask = nn1 < maxr
    if with_normal:
        return sdf_abs, surface_mask, normal, fit_success
    return sdf_abs, surface_mask
