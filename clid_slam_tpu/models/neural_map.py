"""Fixed-capacity voxel-hashed neural point map — the heart of the engine.

TPU-native re-design of the reference's NeuralPoints store
(model/neural_points.py:27-1051). Key differences, by design:

- **Fixed-capacity slabs** instead of torch.cat growth
  (model/neural_points.py:393-431): all per-point arrays are pre-allocated
  with ``capacity + 1`` rows; row ``capacity`` is a zero sentinel used both
  for invalid-gather targets and as the scatter trash row, mirroring the
  reference's "padding in the end" feature row (model/neural_points.py:410).
- **No separate local map copy.** The reference materializes
  local_neural_points / local_geo_features every frame
  (model/neural_points.py:439-536); here locality is enforced *inside the
  query* by the travel-distance window filter
  (model/neural_points.py:1003-1009), so training updates the global feature
  slab directly and `assign_local_to_global` is unnecessary.
- **Masked static shapes everywhere**: insertion takes (points, mask) and
  returns a new state + stats; queries return per-neighbor validity masks.
- The whole state is a pytree (NamedTuple) — pure functions + donated
  buffers under jit, so updates are in-place in XLA.

Query semantics follow model/neural_points.py:553-769 / 971-1030:
K-cell hash probe, travel-dist window filter, collision rejection by
distance, kNN(k) selection, inverse-distance-squared weights, weighted
feature+relative-vector concatenation (weighted_first mode).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.voxel import (
    grid_coords,
    neighbor_hash_soa,
    neighbor_offsets,
    voxel_down_sample_mask,
    voxel_hash,
)


_EMPTY_POS = 1e9  # mirror sentinel: empty buckets sit "infinitely far away"


class NeuralMapState(NamedTuple):
    """All per-point arrays have a sentinel row at index ``capacity``.

    ``hash_mirror`` is the TPU-native probe accelerator: a [H,4] float32
    companion of the hash table holding (x, y, z, travel_dist_at_create)
    of each bucket's occupant. The K-cell probe is ONE 16-byte row-gather
    per cell — measured ~4x faster than separate idx/position/ts/travel
    gathers, and ~6x faster than per-plane 1-D gathers (XLA's TPU gather
    favors contiguous multi-byte rows). Point indices are only recovered
    (via hash_table) for the k selected nearest neighbors.
    """

    positions: jnp.ndarray  # [C+1, 3] f32
    quats: jnp.ndarray  # [C+1, 4] f32 (wxyz, identity at creation)
    geo_feats: jnp.ndarray  # [C+1, F] f32  (trainable)
    color_feats: jnp.ndarray  # [C+1, Fc] f32 (trainable; Fc=1 dummy when
    # color mapping is off — model/neural_points.py:96-103 equivalent)
    certainty: jnp.ndarray  # [C+1] f32
    ts_create: jnp.ndarray  # [C+1] i32
    ts_update: jnp.ndarray  # [C+1] i32
    count: jnp.ndarray  # scalar i32, number of live points
    hash_table: jnp.ndarray  # [H] i32, -1 = empty, else point index
    hash_mirror: jnp.ndarray  # [H, 4] f32 (x, y, z, travel_at_create)


def init_map(
    capacity: int,
    hash_size: int,
    feature_dim: int,
    color_feature_dim: int = 1,
) -> NeuralMapState:
    c1 = capacity + 1
    return NeuralMapState(
        positions=jnp.zeros((c1, 3), jnp.float32),
        quats=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (c1, 1)),
        geo_feats=jnp.zeros((c1, feature_dim), jnp.float32),
        color_feats=jnp.zeros((c1, color_feature_dim), jnp.float32),
        certainty=jnp.zeros((c1,), jnp.float32),
        ts_create=jnp.zeros((c1,), jnp.int32),
        ts_update=jnp.zeros((c1,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        hash_table=jnp.full((hash_size,), -1, jnp.int32),
        hash_mirror=jnp.full((hash_size, 4), _EMPTY_POS, jnp.float32),
    )


def map_capacity(state: NeuralMapState) -> int:
    return state.positions.shape[0] - 1


# ------------------------------------------------------------------ insert


_OOB = jnp.int32(2_000_000_000)  # out-of-bounds scatter target ("drop")


@partial(jax.jit, static_argnames=("downsample",), donate_argnums=(0,))
def insert_points(
    state: NeuralMapState,
    points: jnp.ndarray,  # [M,3] world frame
    mask: jnp.ndarray,  # [M] bool
    resolution,
    travel_dist: jnp.ndarray,  # [T] accumulated travel distance per frame
    cur_ts,
    diff_travel_dist_local,
    downsample: bool = True,
) -> Tuple[NeuralMapState, jnp.ndarray]:
    """Insert new neural points (semantics of model/neural_points.py:324-437).

    A candidate point claims a slot when its voxel bucket is empty, the
    occupant is far away (hash collision, dist² > 3·res²), or the occupant is
    stale by travel distance. Returns (new_state, new_point_ratio).

    TPU cost discipline (measured, scripts/profile_gather.py): XLA scatter
    costs ~15-50 ns per element into multi-MB tables, so the M-candidate
    scatters (M up to 262k samples/frame) dominated prep. Instead the ≤W
    winners are COMPACTED into a small staging buffer first and only W rows
    touch the slabs. Per-point attribute scatters (quats/features/certainty)
    are gone entirely via the slab invariant: rows at index ≥ count always
    hold (identity quat, zero features, zero certainty) — guaranteed by
    init_map and restored by prune_and_rehash's compaction fill."""
    cap = map_capacity(state)
    hsize = state.hash_table.shape[0]
    m = points.shape[0]
    w = min(32768, m)  # per-frame insertion budget (winners are voxel-
    # downsampled: one per 0.4-ish m voxel, so 32k covers a full scan)

    if downsample:
        mask = voxel_down_sample_mask(points, mask, resolution, hsize)

    m_total = jnp.sum(mask.astype(jnp.int32))
    if m > 65536:
        # compact the (voxel-downsampled) candidates BEFORE the probe:
        # the surf-sample block arrives as 164k masked rows but carries
        # at most ~one winner per visible voxel (<=30k in practice), and
        # the probe chain (mirror + hash_table + ts_update gathers) costs
        # per ROW — compacting first cuts it 2.5x (trace_by_source r5:
        # ~6 ms of insert-chain gathers at bench shapes). Stable order
        # (cumsum) keeps the staging identical to the uncompacted path.
        w1 = 65536
        offs1 = jnp.cumsum(mask.astype(jnp.int32)) - 1
        sel1 = jnp.where(mask & (offs1 < w1), offs1, _OOB)
        points = jnp.zeros((w1, 3), jnp.float32).at[sel1].set(
            points, mode="drop", unique_indices=True
        )
        mask = jnp.arange(w1, dtype=jnp.int32) < jnp.minimum(m_total, w1)
        m = w1

    g = grid_coords(points, resolution)
    h = voxel_hash(g, hsize)
    mir = state.hash_mirror[h]  # [M,4] — occupant position from the mirror
    occupied = mir[..., 0] < _EMPTY_POS * 0.5
    dist2 = jnp.sum((mir[..., :3] - points) ** 2, axis=-1)
    collision = occupied & (dist2 > 3.0 * resolution * resolution)
    cur_idx = state.hash_table[h]
    safe_idx = jnp.where(cur_idx >= 0, cur_idx, cap)
    delta_td = travel_dist[cur_ts] - travel_dist[state.ts_update[safe_idx]]
    stale = delta_td > diff_travel_dist_local

    is_first = state.count == 0
    update = mask & (~occupied | collision | stale | is_first)

    # compact the winners into the [w] staging buffer
    offs = jnp.cumsum(update.astype(jnp.int32)) - 1
    update = update & (offs < w) & (state.count + offs < cap)
    st = jnp.where(update, offs, _OOB)
    stage_pts = jnp.zeros((w, 3), jnp.float32).at[st].set(
        points, mode="drop", unique_indices=True
    )
    stage_h = jnp.full((w,), hsize, jnp.int32).at[st].set(
        h, mode="drop", unique_indices=True
    )
    n_new = jnp.sum(update.astype(jnp.int32))

    # scatter only the W staged rows into the slabs
    wlive = jnp.arange(w, dtype=jnp.int32) < n_new
    new_idx_w = state.count + jnp.arange(w, dtype=jnp.int32)
    slot_w = jnp.where(wlive, new_idx_w, _OOB)
    ts = jnp.asarray(cur_ts, jnp.int32)
    positions = state.positions.at[slot_w].set(
        stage_pts, mode="drop", unique_indices=True
    )
    ts_create = state.ts_create.at[slot_w].set(
        ts, mode="drop", unique_indices=True
    )
    ts_update = state.ts_update.at[slot_w].set(
        ts, mode="drop", unique_indices=True
    )
    # two staged voxels can share a bucket (hash collision): duplicates are
    # possible, so no unique_indices on the table/mirror scatters
    hash_slot = jnp.where(wlive, stage_h, hsize)
    hash_table = state.hash_table.at[hash_slot].set(
        new_idx_w, mode="drop"
    )
    mirror_rows = jnp.concatenate(
        [
            stage_pts,
            jnp.broadcast_to(travel_dist[cur_ts], (w,))[:, None],
        ],
        axis=1,
    )  # [W, 4]
    hash_mirror = state.hash_mirror.at[hash_slot].set(mirror_rows, mode="drop")

    new_ratio = n_new / jnp.maximum(m_total, 1)
    new_state = NeuralMapState(
        positions=positions,
        quats=state.quats,
        geo_feats=state.geo_feats,
        color_feats=state.color_feats,
        certainty=state.certainty,
        ts_create=ts_create,
        ts_update=ts_update,
        count=jnp.minimum(state.count + n_new, cap),
        hash_table=hash_table,
        hash_mirror=hash_mirror,
    )
    return new_state, new_ratio


# ------------------------------------------------------------------- query


class QueryResult(NamedTuple):
    feature: jnp.ndarray  # [N, F+3] weighted feature ‖ relative vector
    weights: jnp.ndarray  # [N, k] normalized IDW weights (0 for invalid)
    knn_idx: jnp.ndarray  # [N, k] point indices (-1 invalid)
    nn_count: jnp.ndarray  # [N] neighbor count before kNN selection
    certainty: jnp.ndarray  # [N] interpolated certainty


def neighborhood_probe(
    state: NeuralMapState,
    points: jnp.ndarray,  # [N,3]
    nb_offs: jnp.ndarray,  # [K,3] static neighbor-cell offsets
    resolution,
    max_valid_dist2,
    travel_dist=None,  # [T] or None
    cur_ts=0,
    diff_travel_dist_local=1e9,
    time_filtering: bool = False,
):
    """[N] points -> ([N,K] dist², [N,K] bucket, [N,K] valid, [N,K,4]
    mirror rows) over the K-cell neighborhood (semantics of
    model/neural_points.py:971-1030) with a single hash-mirror row-gather.
    Empty buckets carry the far sentinel so they fail the distance gate."""
    hsize = state.hash_table.shape[0]
    h = neighbor_hash_soa(points, nb_offs, resolution, hsize)  # [N,K]
    mir = state.hash_mirror[h]  # [N,K,4] — the ONE probe gather
    d2 = jnp.sum((mir[..., :3] - points[:, None, :]) ** 2, axis=-1)
    valid = d2 <= max_valid_dist2  # also rejects empties and collisions
    if time_filtering:
        dtd = jnp.abs(travel_dist[cur_ts] - mir[..., 3])
        valid = valid & (dtd < diff_travel_dist_local)
    return d2, h, valid, mir


def query_feature(
    state: NeuralMapState,
    points: jnp.ndarray,  # [N,3]
    nb_offs: jnp.ndarray,  # [K,3]
    resolution,
    max_valid_dist2,
    knn_k: int,
    travel_dist=None,
    cur_ts=0,
    diff_travel_dist_local=1e9,
    time_filtering: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
    weighted_first: bool = True,
    layer_norm: bool = False,
) -> QueryResult:
    """kNN feature interpolation (model/neural_points.py:553-769).
    Differentiable wrt ``points`` and ``state.geo_feats``.

    ``encode_vecs`` optionally positionally encodes each neighbor's relative
    vector [N,k,3] -> [N,k,P] before IDW weighting
    (model/neural_points.py:676-677); see ops/encoding.py.

    ``weighted_first=False`` returns PER-NEIGHBOR features [N,k,F+P]
    instead of the IDW-weighted sum — callers decode each neighbor and
    weight/reduce the decoded SDFs (reference mapper.py:679-744,
    error_state_iekf.py:217-225). ``layer_norm`` normalizes the gathered
    features over the feature axis (model/neural_points.py:630-631)."""
    cap = map_capacity(state)
    d2, h, pvalid, mir = neighborhood_probe(
        state,
        points,
        nb_offs,
        resolution,
        max_valid_dist2,
        travel_dist,
        cur_ts,
        diff_travel_dist_local,
        time_filtering,
    )
    nn_count = jnp.sum(pvalid.astype(jnp.int32), axis=-1)  # [N]

    # kNN selection: smallest distances first (invalid pushed to 9e3 like
    # model/neural_points.py:606)
    d2_for_sort = jnp.where(pvalid, d2, 9e3)
    neg_top, sel = jax.lax.top_k(-d2_for_sort, knn_k)  # [N,k]
    knn_d2 = -neg_top
    h_sel = jnp.take_along_axis(h, sel, axis=1)  # [N,k]
    valid = jnp.take_along_axis(pvalid, sel, axis=1)
    # dedupe: two probed cells can share a hash bucket and surface the same
    # point twice; keep only the first occurrence (k x k compare, k=6)
    dup = (h_sel[:, :, None] == h_sel[:, None, :]) & (
        jnp.tri(knn_k, knn_k, -1, dtype=bool)[None]
    )
    valid = valid & ~jnp.any(dup, axis=-1)

    # recover point indices only for the k winners (model indices are
    # needed for feature/certainty gathers and training scatters)
    idx_sel = state.hash_table[h_sel]  # [N,k] small gather
    valid = valid & (idx_sel >= 0)
    knn_idx = jnp.where(valid, idx_sel, -1)
    safe = jnp.where(valid, idx_sel, cap)

    feats = state.geo_feats[safe]  # [N,k,F]
    if layer_norm:
        mu = jnp.mean(feats, axis=-1, keepdims=True)
        var = jnp.var(feats, axis=-1, keepdims=True)
        feats = (feats - mu) * jax.lax.rsqrt(var + 1e-5)
    feats = jnp.where(valid[..., None], feats, 0.0)
    nb_pos = jnp.take_along_axis(mir, sel[..., None], axis=1)[..., :3]
    vecs = points[:, None, :] - nb_pos
    if rotate_vecs:
        # after a PGO/BA map adjustment the stored per-point quaternion is
        # the accumulated pose correction; express the relative vector in
        # the point's original frame via the conjugate (passive) rotation
        # (model/neural_points.py:666-671 + utils/tools.py:484-493)
        q = state.quats[safe] * jnp.array([1.0, -1.0, -1.0, -1.0])
        w, u = q[..., :1], q[..., 1:]
        uv = jnp.cross(u, vecs)
        vecs = vecs + 2.0 * (w * uv + jnp.cross(u, uv))
    if encode_vecs is not None:
        vecs = encode_vecs(vecs)  # [N,k,P]
    vecs = jnp.where(valid[..., None], vecs, 0.0)

    # IDW over squared distance (model/neural_points.py:688-706)
    eps = 1e-15
    w = 1.0 / (knn_d2 + eps)
    w = jnp.where(valid, w, 0.0)
    w = jnp.where((nn_count == 0)[:, None], eps, w)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(valid, w, 0.0)

    cert = state.certainty[safe]
    cert = jnp.where(valid, cert, 0.0)
    certainty_q = jnp.sum(cert * w, axis=1)

    feat_vec = jnp.concatenate([feats, vecs], axis=-1)  # [N,k,F+3]
    if weighted_first:
        feature = jnp.sum(feat_vec * w[..., None], axis=1)  # [N,F+3]
    else:
        feature = feat_vec  # [N,k,F+3]: decode-then-weight mode
    return QueryResult(feature, w, knn_idx, nn_count, certainty_q)


def query_color_feature(
    state: NeuralMapState, qres: QueryResult, feature_dim: int
) -> jnp.ndarray:
    """Color-feature interpolation reusing the geometric query's kNN
    (model/neural_points.py:634-754: same neighbors/weights, second feature
    slab, same relative-vector suffix). [N, Fc+3], or per-neighbor
    [N, k, Fc+3] when the query ran in decode-then-weight mode."""
    cap = map_capacity(state)
    valid = qres.knn_idx >= 0
    safe = jnp.where(valid, qres.knn_idx, cap)
    cf = state.color_feats[safe]  # [N,k,Fc]
    cf = jnp.where(valid[..., None], cf, 0.0)
    if qres.feature.ndim == 3:  # weighted_first=False
        vec_part = qres.feature[..., feature_dim:]  # [N,k,3(+pe)]
        return jnp.concatenate([cf, vec_part], axis=-1)
    cw = jnp.sum(cf * qres.weights[..., None], axis=1)  # [N,Fc]
    vec_part = qres.feature[:, feature_dim:]  # weighted rel-vec (3 [+pe])
    return jnp.concatenate([cw, vec_part], axis=-1)


def accumulate_certainty(
    state: NeuralMapState,
    knn_idx: jnp.ndarray,
    weights: jnp.ndarray,
    query_ts=None,
) -> NeuralMapState:
    """Training-mode certainty accumulation + last-update-ts maxing
    (model/neural_points.py:708-737) as deterministic scatter ops."""
    cap = map_capacity(state)
    valid = knn_idx >= 0
    tgt = jnp.where(valid, knn_idx, cap).reshape(-1)
    w = jnp.where(valid, weights, 0.0).reshape(-1)
    certainty = state.certainty.at[tgt].add(w)
    certainty = certainty.at[cap].set(0.0)
    ts_update = state.ts_update
    if query_ts is not None:
        ts_rep = jnp.broadcast_to(
            query_ts.astype(jnp.int32)[:, None], knn_idx.shape
        ).reshape(-1)
        ts_rep = jnp.where(valid.reshape(-1), ts_rep, 0)
        ts_update = ts_update.at[tgt].max(ts_rep)
        ts_update = ts_update.at[cap].set(0)
    return state._replace(certainty=certainty, ts_update=ts_update)


def query_certainty_max(
    state: NeuralMapState,
    points: jnp.ndarray,
    resolution,
    max_valid_dist2,
) -> jnp.ndarray:
    """Max neighbor certainty over the 1-cell neighborhood — the novelty
    check used for adaptive iterations (model/neural_points.py:1032-1051,
    utils/mapper.py:395-435 uses num_nei_cells=1, alpha=0)."""
    nb = neighbor_offsets(1, 0.0)
    d2, h, valid, _ = neighborhood_probe(
        state, points, nb, resolution, max_valid_dist2
    )
    cap = map_capacity(state)
    idx = state.hash_table[h]
    valid = valid & (idx >= 0)
    cert = state.certainty[jnp.where(valid, idx, cap)]
    cert = jnp.where(valid, cert, 0.0)
    return jnp.max(cert, axis=-1)


def query_certainty_own_cell(
    state: NeuralMapState,
    points: jnp.ndarray,  # [N,3]
    resolution,
) -> jnp.ndarray:
    """Own-cell certainty for the novelty gate, skipping the mirror
    distance check: TWO random gathers instead of three (the exact path
    cost 7.4 ms/frame at bench shapes, trace_by_source r5).

    Exactness argument: the novelty probe uses num_nei_cells=1, alpha=0 —
    the sample's OWN voxel only (utils/mapper.py:410-411). A bucket's
    occupant lives in the voxel that hashed there, so its distance to any
    query in that voxel is bounded by the cell diagonal (3·res² <
    max_valid_dist2 = 12·res²) — the distance gate can only reject HASH
    COLLISIONS (a different cell's occupant sharing the bucket, ~load
    factor of empty-cell queries). Skipping it returns the collider's
    certainty for that small set; the flip is hash-deterministic, hence
    identical across drivers (classic/streaming parity holds — unlike a
    travel-stamp recency proxy that was tried first and measurably
    shifted the adaptive-iteration ratios, r5)."""
    hsize = state.hash_table.shape[0]
    cap = map_capacity(state)
    h = voxel_hash(grid_coords(points, resolution), hsize)
    idx = state.hash_table[h]  # [N]
    valid = idx >= 0
    cert = state.certainty[jnp.where(valid, idx, cap)]
    return jnp.where(valid, cert, 0.0)


# ------------------------------------------------------------------- prune


@partial(jax.jit, donate_argnums=(0,), static_argnames=("global_prune",))
def prune_and_rehash(
    state: NeuralMapState,
    prune_certainty_thre,
    travel_dist,
    cur_ts,
    diff_travel_dist_local,
    resolution,
    global_prune: bool = False,
):
    """Drop inactive low-certainty points and rebuild the hash
    (model/neural_points.py:771-812 + 840-929) via an O(C) cumsum
    compaction — no host roundtrip, runs entirely under jit."""
    cap = map_capacity(state)
    live = jnp.arange(cap + 1) < state.count
    certain = state.certainty[: cap + 1] >= prune_certainty_thre
    if global_prune:
        keep = live & certain
    else:
        dtd = jnp.abs(travel_dist[cur_ts] - travel_dist[state.ts_update])
        inactive = dtd > diff_travel_dist_local
        keep = live & ~(inactive & ~certain)

    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep, new_pos, cap)

    def compact(arr, fill=0.0):
        out = jnp.full_like(arr, fill)
        out = out.at[slot].set(arr)
        return out.at[cap].set(fill)

    positions = compact(state.positions)
    # freed rows must satisfy the insert_points slab invariant:
    # identity quaternion, zero features/certainty (zeros come free from
    # compact's fill; the quat w-component needs restoring)
    quats = compact(state.quats)
    dead = jnp.arange(cap + 1) >= jnp.sum(keep.astype(jnp.int32))
    quats = jnp.where(
        dead[:, None], jnp.array([1.0, 0, 0, 0], jnp.float32), quats
    )
    geo_feats = compact(state.geo_feats)
    color_feats = compact(state.color_feats)
    certainty = compact(state.certainty)
    ts_create = compact(state.ts_create, 0)
    ts_update = compact(state.ts_update, 0)
    new_count = jnp.sum(keep.astype(jnp.int32))

    hash_table, hash_mirror = _rebuild_hash(
        positions, ts_create, new_count, travel_dist, resolution,
        state.hash_table.shape[0],
    )
    return NeuralMapState(
        positions=positions,
        quats=quats,
        geo_feats=geo_feats,
        color_feats=color_feats,
        certainty=certainty,
        ts_create=ts_create,
        ts_update=ts_update,
        count=new_count,
        hash_table=hash_table,
        hash_mirror=hash_mirror,
    )


def _rebuild_hash(positions, ts_create, count, travel_dist, resolution, hsize):
    """Rebuild hash table + mirror over the first ``count`` points
    (model/neural_points.py:840-929 semantics)."""
    cap = positions.shape[0] - 1
    g = grid_coords(positions, resolution)
    h = voxel_hash(g, hsize)
    live = jnp.arange(cap + 1) < count
    slot_h = jnp.where(live, h, hsize)
    hash_table = jnp.full((hsize,), -1, jnp.int32)
    hash_table = hash_table.at[slot_h].set(
        jnp.arange(cap + 1, dtype=jnp.int32), mode="drop"
    )
    travel_at_create = travel_dist[jnp.clip(ts_create, 0)]
    hash_mirror = jnp.full((hsize, 4), _EMPTY_POS, jnp.float32)
    hash_mirror = hash_mirror.at[slot_h].set(
        jnp.concatenate([positions, travel_at_create[:, None]], axis=1),
        mode="drop",
    )
    return hash_table, hash_mirror


def adjust_map(
    state: NeuralMapState,
    pose_diff: jnp.ndarray,  # [T,4,4] per-frame pose corrections
    travel_dist: jnp.ndarray,
    resolution,
    use_mid_ts: bool = True,
) -> NeuralMapState:
    """Apply per-frame pose corrections (from PGO / global BA) to the map
    (model/neural_points.py:814-838): each point is transformed by the
    correction of its (mid) timestamp, its stored orientation accumulates
    the rotation, and the hash is rebuilt for the moved positions. Queries
    issued afterwards must pass ``rotate_vecs=True`` so relative vectors
    are expressed in each point's original frame."""
    from ..utils import lie

    cap = map_capacity(state)
    ts = (
        (state.ts_create + state.ts_update) // 2
        if use_mid_ts
        else state.ts_create
    )
    T = pose_diff[jnp.clip(ts, 0)]  # [C+1,4,4]
    R, t = T[:, :3, :3], T[:, :3, 3]
    live = (jnp.arange(cap + 1) < state.count)[:, None]
    # VPU matvec (multiply+reduce) — bf16 MXU truncation would shift the map
    moved = jnp.sum(R * state.positions[:, None, :], axis=-1) + t
    positions = jnp.where(live, moved, state.positions)
    dq = lie.rotmat_to_quat(R)
    quats = jnp.where(live, lie.quat_multiply(dq, state.quats), state.quats)
    hash_table, hash_mirror = _rebuild_hash(
        positions, state.ts_create, state.count, travel_dist, resolution,
        state.hash_table.shape[0],
    )
    return state._replace(
        positions=positions,
        quats=quats,
        hash_table=hash_table,
        hash_mirror=hash_mirror,
    )


def memory_mb(state: NeuralMapState, feature_dim: int) -> float:
    """Map memory accounting (model/neural_points.py:157-174)."""
    n = int(state.count)
    point_dim = feature_dim + 3 + 4
    return n * point_dim * 4 / 1024 / 1024
