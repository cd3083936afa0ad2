"""Voxel hashing and masked voxel downsampling, static-shape / jit-friendly.

The reference grows a dynamic int64 hash table and compacts with
torch.unique (utils/tools.py:639-724, model/neural_points.py:347-351). Here
everything is fixed capacity:

- ``voxel_hash``: multiplicative-xor hash over the 3 voxel coordinates using
  the reference's primes (model/neural_points.py:79-80), reduced into a
  power-of-two table with a bitwise AND (cheaper than mod on TPU, and avoids
  torch.fmod's negative-index wrap quirk entirely).
- ``voxel_down_sample_mask``: "keep the point closest to its voxel center"
  selection (semantics of utils/tools.py:639-682) via a scatter-min race on a
  fixed hash table; returns a keep-mask rather than compacting indices.
- ``voxel_down_sample_min_value_mask``: keep the per-voxel point with the
  minimum auxiliary value (utils/tools.py:685-724), used for map rehash/merge.

All keys are packed into int32 (JAX default; no x64 requirement): the
quantized score gets however many bits remain above log2(N). Hash-bucket
collisions between *different* voxels are resolved by dropping one voxel's
representative (rare when table size >= 4x point count); downstream insertion
treats this as a slightly coarser downsample, which is safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max


def grid_coords(points: jnp.ndarray, resolution) -> jnp.ndarray:
    """[N,3] float -> [N,3] int32 voxel coordinates."""
    return jnp.floor(points / resolution).astype(jnp.int32)


def voxel_hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """[...,3] int32 voxel coords -> [...] bucket index in [0, table_size).

    table_size must be a power of two (enforced by Config).
    """
    c = coords.astype(jnp.uint32)
    # sum (not xor) of prime multiples: p1·dx + p2·dy + p3·dz ≡ 0 (mod 2^32)
    # has no small-coordinate solutions, so nearby voxels never collide
    # pre-mix (xor of prime multiples does collide structurally)
    h = (
        c[..., 0] * jnp.uint32(73856093)
        + c[..., 1] * jnp.uint32(19349669)
        + c[..., 2] * jnp.uint32(83492791)
    )
    # murmur3 finalizer: multiplicative hashes have weak low bits, and the
    # power-of-two AND below keeps only low bits — avalanche them first
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _packed_score_key(score_unit: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pack (score in [0,1], index) into a single int32 key: lower score wins,
    ties broken by smaller index. Invalid entries get INT32_MAX."""
    n = score_unit.shape[0]
    levels = max(2, (INT32_MAX - 1) // n - 1)
    levels = min(levels, 32766)
    sq = jnp.clip(score_unit * levels, 0, levels).astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    key = sq * n + idx
    return jnp.where(mask, key, INT32_MAX)


@partial(jax.jit, static_argnames=("table_size",))
def voxel_down_sample_mask(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    resolution,
    table_size: int,
) -> jnp.ndarray:
    """Keep-mask selecting, per voxel, the point closest to the voxel center.

    points: [N,3]; mask: [N] bool (invalid points never win nor survive).
    Same selection criterion as the reference's quantized scatter_reduce amin
    trick (utils/tools.py:656-676), but deterministic on TPU.
    """
    g = jnp.floor(points / resolution)
    center = (g + 0.5) * resolution
    dist2 = jnp.sum((points - center) ** 2, axis=-1)
    max_d2 = 0.75 * resolution * resolution + 1e-12  # max dist2 within a voxel
    key = _packed_score_key(dist2 / max_d2, mask)
    h = voxel_hash(g.astype(jnp.int32), table_size)
    table = jnp.full((table_size,), INT32_MAX, dtype=jnp.int32)
    table = table.at[h].min(key)
    winner = table[h] == key
    return winner & mask


@partial(jax.jit, static_argnames=("table_size",))
def voxel_down_sample_min_value_mask(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    resolution,
    value: jnp.ndarray,
    table_size: int,
) -> jnp.ndarray:
    """Keep-mask selecting, per voxel, the point with minimum ``value``
    (semantics of utils/tools.py:685-724)."""
    g = grid_coords(points, resolution)
    vmax = jnp.max(jnp.where(mask, value, -jnp.inf))
    vmin = jnp.min(jnp.where(mask, value, jnp.inf))
    unit = (value - vmin) / jnp.clip(vmax - vmin, 1e-12)
    key = _packed_score_key(unit, mask)
    h = voxel_hash(g, table_size)
    table = jnp.full((table_size,), INT32_MAX, dtype=jnp.int32)
    table = table.at[h].min(key)
    winner = table[h] == key
    return winner & mask


def _murmur_mix(h: jnp.ndarray) -> jnp.ndarray:
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def neighbor_hash_soa(
    points: jnp.ndarray,  # [N,3]
    nb_offs: jnp.ndarray,  # [K,3] int32
    resolution,
    table_size: int,
) -> jnp.ndarray:
    """[N,K] bucket indices for the K-cell neighborhood of each point, in
    structure-of-arrays form: all heavy elementwise work happens on [N,K]
    planes (full 128-lane occupancy) instead of [...,3] tensors (3/128
    lanes). The per-cell prime products are hoisted: hash(g+dx) needs one
    add per (point, cell) plus the murmur mix, not three int multiplies.
    """
    g = jnp.floor(points / resolution).astype(jnp.int32)  # [N,3]
    gu = g.astype(jnp.uint32)
    base = (
        gu[:, 0] * jnp.uint32(73856093)
        + gu[:, 1] * jnp.uint32(19349669)
        + gu[:, 2] * jnp.uint32(83492791)
    )  # [N]
    ou = nb_offs.astype(jnp.uint32)
    off = (
        ou[:, 0] * jnp.uint32(73856093)
        + ou[:, 1] * jnp.uint32(19349669)
        + ou[:, 2] * jnp.uint32(83492791)
    )  # [K]
    h = _murmur_mix(base[:, None] + off[None, :])  # [N,K]
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def neighbor_offsets(num_nei_cells: int, search_alpha: float):
    """Static [K,3] int32 neighbor-cell offsets within the search sphere
    (semantics of model/neural_points.py:931-967: |dx|² < (cells+alpha)²).

    K for (cells=2, alpha=0.2/0.3/0.5/1.0) = 33/57/81/93, matching the
    reference's table.

    Returns a NUMPY array on purpose: jitted functions close over it, and a
    captured *device* array (committed jnp constant) knocks the axon TPU
    runtime off its fast dispatch path session-wide (~30 ms added to every
    subsequent executable run — measured r1). A numpy constant is embedded
    in the HLO as a literal and stays fast.
    """
    import numpy as np

    r = np.arange(-num_nei_cells, num_nei_cells + 1)
    dx = np.stack(np.meshgrid(r, r, r, indexing="ij"), axis=-1).reshape(-1, 3)
    d2 = (dx**2).sum(-1)
    keep = d2 < (num_nei_cells + search_alpha) ** 2
    return np.asarray(dx[keep], dtype=np.int32)
