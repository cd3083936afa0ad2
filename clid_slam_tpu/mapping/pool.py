"""Replay data pool: fixed-capacity ring of SDF training samples.

Capabilities of the reference's pool logic (utils/mapper.py:84-97, 297-392,
473-523): per-frame sample append, sliding-window radius filtering,
capacity cap, and batch sampling that mixes "new-region" samples with
history replay.

TPU-native differences:
- **AoS row layout**: every per-sample attribute lives in one packed
  [P, 8+C] float32 row — (x, y, z, sdf, weight, ts, sem, pad, color...).
  XLA's TPU gather/scatter cost is per ROW, nearly independent of row
  width (scripts/profile_gather.py), so the per-frame append is ONE
  262k-row scatter instead of six, and a training batch is ONE gather.
  ts/sem ride as float32 (exact for frame ids < 2^24 and label ids);
- fixed arrays [P] with a live prefix [0, size) and a per-row ``valid``
  mask; the sliding-window filter only REWRITES THE MASK (one vectorized
  pass) instead of compacting — an O(P) row-scatter compaction costs
  ~200 ms on TPU while the mask pass is bandwidth-bound (~0.3 ms).
  Out-of-window rows linger as dead slots until eviction recycles them;
  batch sampling gates on the mask (the reference re-allocates with
  boolean indexing every frame, utils/mapper.py:361-367 — same training
  distribution, different storage discipline);
- when an append would overflow, the overflowing new samples overwrite
  *uniform-random old* slots (the reference discards random old samples to
  make room, utils/mapper.py:350-358 — same steady-state distribution).
  Cheaper block/stripe eviction schemes were tried and measurably degrade
  trajectory accuracy (30-frame synthetic ATE 0.23 -> 0.55 m): replay
  retention must stay row-uniform;
- sensor-frame sample coords are NOT stored (the reference keeps them for
  BA re-transforms): they are recomputed exactly as inv(T_old[ts])·coords
  when poses change, saving a [P,3] slab and a ~21 ms/frame scatter;
- "new-region" sample indices live in a fixed side buffer (new_buf,
  new_count) rebuilt each frame, mirroring utils/mapper.py:429-441.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# fixed column indices of the packed row
_X, _SDF, _W, _TS, _SEM, _PAD = 0, 3, 4, 5, 6, 7
BASE_COLS = 8  # color channels start here


class ReplayPool(NamedTuple):
    data: jnp.ndarray  # [P, 8+C] packed rows (see module docstring)
    valid: jnp.ndarray  # [P] bool — live AND inside the sliding window
    size: jnp.ndarray  # scalar i32, high-water prefix length
    new_buf: jnp.ndarray  # [B] i32 indices of new-region samples
    new_count: jnp.ndarray  # scalar i32

    # column views (cold paths; hot paths gather whole rows and slice)
    @property
    def coords(self) -> jnp.ndarray:
        return self.data[..., _X : _X + 3]

    @property
    def sdf(self) -> jnp.ndarray:
        return self.data[..., _SDF]

    @property
    def weight(self) -> jnp.ndarray:
        return self.data[..., _W]

    @property
    def ts(self) -> jnp.ndarray:
        return self.data[..., _TS].astype(jnp.int32)

    @property
    def sem(self) -> jnp.ndarray:
        return self.data[..., _SEM].astype(jnp.int32)

    @property
    def color(self) -> jnp.ndarray:
        return self.data[..., BASE_COLS:]


def split_rows(rows: jnp.ndarray):
    """Slice a gathered [N, 8+C] row block into
    (coords, sdf, weight, ts_i32, sem_i32, color)."""
    return (
        rows[..., _X : _X + 3],
        rows[..., _SDF],
        rows[..., _W],
        rows[..., _TS].astype(jnp.int32),
        rows[..., _SEM].astype(jnp.int32),
        rows[..., BASE_COLS:],
    )


def init_pool(
    capacity: int, new_buf_size: int, color_channels: int = 1
) -> ReplayPool:
    data = jnp.zeros((capacity, BASE_COLS + color_channels), jnp.float32)
    data = data.at[:, _SEM].set(-1.0)  # unlabeled
    return ReplayPool(
        data=data,
        valid=jnp.zeros((capacity,), bool),
        size=jnp.zeros((), jnp.int32),
        new_buf=jnp.zeros((new_buf_size,), jnp.int32),
        new_count=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def filter_pool(
    pool: ReplayPool, origin: jnp.ndarray, window_radius
) -> ReplayPool:
    """Drop samples outside the sliding window (utils/mapper.py:338-367) —
    mask-only: no compaction (see module docstring). Invalidates new_buf
    (callers re-append and re-compute novelty afterwards, as process_frame
    does)."""
    d2 = jnp.sum((pool.coords - origin) ** 2, axis=-1)
    keep = pool.valid & (d2 < window_radius * window_radius)
    return pool._replace(
        valid=keep,
        new_buf=jnp.zeros_like(pool.new_buf),
        new_count=jnp.zeros_like(pool.new_count),
    )


@partial(jax.jit, donate_argnums=(0,))
def append_samples(
    pool: ReplayPool,
    coords: jnp.ndarray,  # [M,3] world frame
    sdf: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray,
    frame_id,
    is_new: jnp.ndarray,  # [M] bool novelty flags (certainty+label gated)
    color=None,  # [M,C] or None
    sem=None,  # [M] i32 or None
    key=None,  # PRNG key for overflow replacement slots
) -> ReplayPool:
    """Append one frame's (masked) samples; when the frame does not fit,
    samples evict uniform-random old slots (the reference discards random
    old samples, utils/mapper.py:350-358). Collisions between two evictors
    lose one sample — same as the reference's random discard.

    Scatter discipline (r5 rework, scripts/trace_by_source.py): the old
    path argsorted the slots and reordered every value column through a
    262k gather (argsort 1.9 ms + 9 reorder gathers ~6 ms + 9 column
    scatters ~9 ms = 15+ ms/frame, the hottest line in the step). The
    slots are now generated ALREADY SORTED with values left in frame
    order:

    - filling phase: destinations ``size + cumsum(mask)`` are ascending
      by construction;
    - eviction phase: sorted uniform-random slots come from normalized
      exponential prefix sums (order statistics: E_i iid exp(1) =>
      S_k/S_{m+1} are the sorted U(0,1) order statistics) — the slot
      MULTISET is distributed exactly like iid uniform draws, which is
      what uniform eviction requires (sample content is an unordered bag:
      batch sampling is uniform over [0,size) regardless of position);
    - masked-out rows take the NEXT valid row's slot (reverse cummin
      backfill) so sortedness holds and the later valid row overwrites
      the placeholder write; trailing masked rows get the out-of-bounds
      sentinel (>= every slot, still sorted, dropped by the scatter).

    A frame that only PARTLY fits declares the pool full and routes every
    row through eviction over [0, P): slots in the unfilled tail become
    live as written, the few never-written tail rows stay valid=False
    (batch-sampled rows gate on validity downstream) — a one-frame
    transition approximation.

    Constant columns are skipped: pad is always 0, sem stays -1 and color
    stays 0 unless those labels are enabled (init_pool invariant +
    evicted rows can only hold values this function wrote)."""
    p = pool.data.shape[0]
    m = coords.shape[0]
    offs = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n_valid = jnp.sum(mask.astype(jnp.int32))
    fits = pool.size + n_valid <= p

    slot_fill = pool.size + offs
    if key is not None:
        # sorted uniform order statistics over [0, p)
        e = -jnp.log(
            jnp.clip(jax.random.uniform(key, (m + 1,)), 1e-12, 1.0)
        )
        s = jnp.cumsum(e)
        slot_evict = jnp.minimum(
            (s[:m] / s[m] * p).astype(jnp.int32), p - 1
        )
        slot = jnp.where(fits, slot_fill, slot_evict)
    else:
        slot = slot_fill
    # masked rows: backfill with the next valid slot (reverse cummin),
    # sentinel p for the trailing run
    slot = jnp.where(mask, slot, p)
    slot = jnp.flip(jax.lax.cummin(jnp.flip(slot)))
    slot = jnp.minimum(slot, p)  # out-of-bounds rows drop

    cols = {
        0: coords[:, 0],
        1: coords[:, 1],
        2: coords[:, 2],
        _SDF: sdf,
        _W: weight,
        _TS: jnp.float32(1.0) * frame_id + jnp.zeros_like(sdf),
    }
    if sem is not None:
        cols[_SEM] = sem.astype(jnp.float32)
    if color is not None:
        for c in range(color.shape[1]):
            cols[BASE_COLS + c] = color[:, c]
    data = pool.data
    for c, v in cols.items():
        data = data.at[slot, c].set(
            v, mode="drop", indices_are_sorted=True
        )
    valid_arr = pool.valid.at[slot].set(
        True, mode="drop", indices_are_sorted=True
    )

    # new-region index side buffer (records where each new sample landed)
    nb = pool.new_buf.shape[0]
    new_flag = mask & is_new
    noffs = jnp.cumsum(new_flag.astype(jnp.int32)) - 1
    nslot = jnp.where(new_flag & (noffs < nb), noffs, nb)
    new_buf = jnp.zeros_like(pool.new_buf)
    new_buf = new_buf.at[nslot].set(slot.astype(jnp.int32), mode="drop")
    new_count = jnp.minimum(jnp.sum(new_flag.astype(jnp.int32)), nb)

    return ReplayPool(
        data=data,
        valid=valid_arr,
        size=jnp.where(fits, pool.size + n_valid, jnp.int32(p)),
        new_buf=new_buf,
        new_count=new_count,
    )


def retransform_coords(
    pool: ReplayPool, old_poses: jnp.ndarray, new_poses: jnp.ndarray
) -> ReplayPool:
    """Re-express stored world coords after a pose correction (BA / PGO):
    coords' = T_new[ts] · T_old[ts]⁻¹ · coords. Replaces the reference's
    stored sensor-frame coords (utils/mapper.py:323-327 re-transforms from
    origin coords; algebraically identical)."""
    R_o = old_poses[:, :3, :3]
    t_o = old_poses[:, :3, 3]
    R_n = new_poses[:, :3, :3]
    t_n = new_poses[:, :3, 3]
    # diff = T_new @ inv(T_old):  R_d = R_n R_oᵀ,  t_d = t_n - R_d t_o
    R_d = jnp.einsum("tij,tkj->tik", R_n, R_o)
    t_d = t_n - jnp.einsum("tij,tj->ti", R_d, t_o)
    ts = jnp.clip(pool.ts, 0, old_poses.shape[0] - 1)
    R = R_d[ts]
    t = t_d[ts]
    coords = jnp.einsum("bij,bj->bi", R, pool.coords) + t
    return pool._replace(data=pool.data.at[:, _X : _X + 3].set(coords))


def sample_batch_indices(
    pool: ReplayPool, key: jax.Array, bs: int, bs_new: int
) -> jnp.ndarray:
    """Mixed replay batch: bs_new indices from the new-region buffer (when
    available) + the rest uniform over the pool (utils/mapper.py:473-500)."""
    k1, k2 = jax.random.split(key)
    hi = jnp.maximum(pool.size, 1)
    idx_hist = jax.random.randint(k1, (bs,), 0, hi)
    if bs_new > 0:
        n_new = jnp.maximum(pool.new_count, 1)
        pick = jax.random.randint(k2, (bs_new,), 0, n_new)
        idx_new = pool.new_buf[pick]
        # only take the new-mix when new samples exist
        use_new = (pool.new_count > 0) & (
            jnp.arange(bs) >= (bs - bs_new)
        )
        idx = jnp.where(
            use_new,
            jnp.concatenate([jnp.zeros(bs - bs_new, jnp.int32), idx_new]),
            idx_hist,
        )
        return idx
    return idx_hist
