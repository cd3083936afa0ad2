"""Spatially sharded neural point map over a device mesh ('sp' axis).

The reference is single-GPU; its answer to map growth is windowing + pruning
(SURVEY.md §5 "long-context analog"). This module is the TPU-native scaling
path: the global map is split into S shards, each holding a fixed-capacity
point slab and its own open-addressing hash table, so **map capacity and
query bandwidth scale linearly with devices**.

Design (idiomatic SPMD, not a port):

- **Ownership by voxel hash.** A voxel belongs to shard
  ``mix(voxel_hash) % S``. Hash ownership load-balances perfectly and needs
  no global bounding box (SLAM trajectories are unbounded), at the cost of
  no spatial locality — which is irrelevant here because the combine step
  is a fixed-size collective either way, and ICI is fast.
- **Replicated queries, local partial kNN, distance-only exchange.** Query
  points are replicated. Each shard probes its local hash for all K
  neighborhood cells — its table only holds points it OWNS, so its probe
  yields exactly its own candidates (ownership partitions cells; no
  cross-shard duplicates by construction). Each shard top-k-selects its
  own k best candidates, and only the [N,k] candidate DISTANCES are
  all-gathered; every shard then computes the identical global top-k over
  the S·k merged candidates and contributes its winners' payload
  (position‖features‖certainty) to positionally-disjoint slots of ONE
  masked ``psum`` [N,k,3+F+1]. This replaces the r2 design (full-candidate
  ``psum`` of [N,K,4] mirror rows + two [N,K] pmins) — the spatial-halo
  analog for hash ownership, where "boundary traffic" is the k-candidate
  frontier instead of a geometric ring.
- **Feature gathers/scatters stay shard-local.** The loss consumes the
  combined features, so autodiff routes each shard's gradient back through
  its own masked gather to its own slab — the psum transpose is free
  (broadcast). Certainty scatter-adds are applied by each shard to its own
  winners.

Per-QUERY collective traffic at K=81 cells, k=6, F=8 (f32):
  r2 combine:  psum[K,4] + 2·pmin[K] + psum[k,F+1]  = (324+162+54)·4 = 2160 B
  this combine: all_gather[k] + psum[k, 3+F+1]      = (6+72)·4      =  312 B
a 6.9x reduction (collective_bytes_per_query() reports both; the scaling
benchmark records measured step times over mesh sizes).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..mapping import mapper as mp
from ..mapping.pool import ReplayPool, sample_batch_indices
from ..models import decoder as dec
from ..models import neural_map as nm
from ..ops.voxel import grid_coords, _murmur_mix


def make_spatial_mesh(n_devices=None, axis: str = "sp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_owner(points: jnp.ndarray, resolution, n_shards: int) -> jnp.ndarray:
    """[N,3] world points -> [N] owner shard of each point's voxel.

    Re-mixed so ownership bits are independent of the local bucket bits
    (both derive from the same prime-sum base)."""
    g = grid_coords(points, resolution).astype(jnp.uint32)
    base = (
        g[..., 0] * jnp.uint32(73856093)
        + g[..., 1] * jnp.uint32(19349669)
        + g[..., 2] * jnp.uint32(83492791)
    )
    h = _murmur_mix(base + jnp.uint32(0x9E3779B9))
    return (h % jnp.uint32(n_shards)).astype(jnp.int32)


def init_sharded_map(
    mesh: Mesh,
    capacity_per_shard: int,
    hash_size_per_shard: int,
    feature_dim: int,
    color_feature_dim: int = 1,
    axis: str = "sp",
) -> nm.NeuralMapState:
    """A NeuralMapState whose arrays carry a leading [S] shard axis placed
    over the mesh: shard s's slab lives entirely on device s."""
    S = mesh.shape[axis]
    st = nm.init_map(
        capacity_per_shard, hash_size_per_shard, feature_dim, color_feature_dim
    )

    def rep(a):
        out = jnp.broadcast_to(a[None], (S,) + a.shape)
        spec = P(axis, *([None] * a.ndim))
        return jax.device_put(out, NamedSharding(mesh, spec))

    return jax.tree.map(rep, st)


def _local(tree):
    return jax.tree.map(lambda a: a[0], tree)


def _boxed(tree):
    return jax.tree.map(lambda a: a[None], tree)


class SpatialQueryResult(NamedTuple):
    feature: jnp.ndarray  # [N, F+3] replicated
    weights: jnp.ndarray  # [N, k] replicated
    knn_idx: jnp.ndarray  # [N, k] LOCAL indices (-1 where not my winner)
    nn_count: jnp.ndarray  # [N] replicated
    certainty: jnp.ndarray  # [N] replicated


_FAR = 9e3


def collective_bytes_per_query(n_cells: int, knn_k: int, feature_dim: int):
    """Per-query collective payload bytes: (r2 full-candidate combine,
    current partial-kNN combine). Documents the measured ≥5x reduction."""
    old = (n_cells * 4 + 2 * n_cells + knn_k * (feature_dim + 1)) * 4
    new = (knn_k + knn_k * (3 + feature_dim + 1)) * 4
    return old, new


def _partial_knn(
    st: nm.NeuralMapState,
    points: jnp.ndarray,
    k: int,
    *,
    nb_offs,
    resolution,
    max_valid_dist2,
    travel_dist,
    cur_ts,
    window,
    time_filtering,
):
    """Local k-best candidates over the cells THIS shard owns (its hash
    only stores owned points). Returns (kd2 [N,k] with _FAR at invalid,
    h_sel [N,k] local buckets, n_valid [N] local candidate count)."""
    d2, h, valid, mir = nm.neighborhood_probe(
        st, points, nb_offs, resolution, max_valid_dist2,
        travel_dist, cur_ts, window, time_filtering,
    )
    d2m = jnp.where(valid, d2, _FAR)
    negk, selk = jax.lax.top_k(-d2m, k)  # [N,k]
    kd2 = -negk
    h_sel = jnp.take_along_axis(h, selk, axis=1)
    kvalid = jnp.take_along_axis(valid, selk, axis=1)
    # dedupe: the same bucket can surface via two probed cells
    dup = (h_sel[:, :, None] == h_sel[:, None, :]) & (
        jnp.tri(k, k, -1, dtype=bool)[None]
    )
    kvalid = kvalid & ~jnp.any(dup, axis=-1)
    kd2 = jnp.where(kvalid, kd2, _FAR)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    return kd2, h_sel, n_valid


def _combined_query(
    st: nm.NeuralMapState,  # local shard state (no leading axis)
    points: jnp.ndarray,
    *,
    axis: str,
    n_shards: int,
    nb_offs,
    resolution,
    max_valid_dist2,
    knn_k: int,
    travel_dist=None,
    cur_ts=0,
    window=1e9,
    time_filtering: bool = False,
    encode_vecs=None,
) -> SpatialQueryResult:
    """nm.query_feature semantics over the union of all shards' points.
    Runs inside shard_map; differentiable wrt st.geo_feats (shard-local).

    Combine = partial-kNN exchange (module docstring): all_gather of the
    [N,k] per-shard candidate distances, replicated global top-k over the
    S·k merged candidates, one masked psum of the winners' payload."""
    my = jax.lax.axis_index(axis)
    kd2, h_sel, n_local = _partial_knn(
        st, points, knn_k,
        nb_offs=nb_offs, resolution=resolution,
        max_valid_dist2=max_valid_dist2, travel_dist=travel_dist,
        cur_ts=cur_ts, window=window, time_filtering=time_filtering,
    )
    n = points.shape[0]
    all_d2 = jax.lax.all_gather(kd2, axis)  # [S,N,k]
    flat = jnp.transpose(all_d2, (1, 0, 2)).reshape(n, n_shards * knn_k)
    negg, selg = jax.lax.top_k(-flat, knn_k)  # replicated global top-k
    knn_d2 = -negg  # [N,k]
    win_shard = selg // knn_k  # [N,k]
    win_slot = selg % knn_k
    valid_sel = knn_d2 < _FAR
    nn_count = jax.lax.psum(n_local, axis)  # [N] candidates across shards

    # my winners' payload, scattered into their global slot positions
    mine = valid_sel & (win_shard == my)  # [N,k]
    slot = jnp.where(mine, win_slot, 0)
    my_h = jnp.take_along_axis(h_sel, slot, axis=1)  # [N,k] local buckets
    cap = nm.map_capacity(st)
    idx_local = st.hash_table[my_h]
    mine = mine & (idx_local >= 0)
    knn_idx = jnp.where(mine, idx_local, -1)
    safe = jnp.where(mine, idx_local, cap)

    feats = jnp.where(mine[..., None], st.geo_feats[safe], 0.0)
    cert = jnp.where(mine, st.certainty[safe], 0.0)
    pos = jnp.where(mine[..., None], st.positions[safe], 0.0)
    payload = jnp.concatenate([pos, feats, cert[..., None]], axis=-1)
    payload = jax.lax.psum(payload, axis)  # [N,k,3+F+1] — ONE combine
    nb_pos = payload[..., :3]
    feats_c = payload[..., 3:-1]
    cert_c = payload[..., -1]

    vecs = points[:, None, :] - nb_pos
    if encode_vecs is not None:
        vecs = encode_vecs(vecs)
    vecs = jnp.where(valid_sel[..., None], vecs, 0.0)

    eps = 1e-15
    w = 1.0 / (knn_d2 + eps)
    w = jnp.where(valid_sel, w, 0.0)
    w = jnp.where((nn_count == 0)[:, None], eps, w)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(valid_sel, w, 0.0)

    certainty_q = jnp.sum(cert_c * w, axis=1)
    feat_vec = jnp.concatenate([feats_c, vecs], axis=-1)
    feature = jnp.sum(feat_vec * w[..., None], axis=1)
    return SpatialQueryResult(feature, w, knn_idx, nn_count, certainty_q)


def _combined_query_chunked(
    st: nm.NeuralMapState,
    points: jnp.ndarray,  # [N,3] REPLICATED (identical on every shard)
    *,
    axis: str,
    n_shards: int,
    nb_offs,
    resolution,
    max_valid_dist2,
    knn_k: int,
    travel_dist=None,
    cur_ts=0,
    window=1e9,
    time_filtering: bool = False,
    encode_vecs=None,
):
    """_combined_query with BATCH-SHARDED outputs: the winners' payload is
    reduce-scattered over the batch axis, so each shard materializes the
    interpolated features for only its N/S chunk and all downstream math
    (MLP forward/backward, losses, eikonal taps) costs 1/S per shard — the
    DP x SP composition (SURVEY §2.3). ``psum_scatter``'s linear transpose
    is ``all_gather``, so under AD every chunk's feature cotangent reaches
    every owning shard's slab (validated against the replicated path in
    tests/test_spatial.py).

    Returns (feature_chunk [N/S, F+P], w_chunk [N/S,k], nn_count_chunk,
    certainty_chunk, knn_idx_full [N,k] local winners, w_full [N,k]) —
    the full-batch winner indices/weights feed the (cheap, local)
    certainty scatter.
    """
    my = jax.lax.axis_index(axis)
    n = points.shape[0]
    assert n % n_shards == 0, "batch must divide the shard count"
    chunk = n // n_shards

    kd2, h_sel, n_local = _partial_knn(
        st, points, knn_k,
        nb_offs=nb_offs, resolution=resolution,
        max_valid_dist2=max_valid_dist2, travel_dist=travel_dist,
        cur_ts=cur_ts, window=window, time_filtering=time_filtering,
    )
    all_d2 = jax.lax.all_gather(kd2, axis)  # [S,N,k]
    flat = jnp.transpose(all_d2, (1, 0, 2)).reshape(n, n_shards * knn_k)
    negg, selg = jax.lax.top_k(-flat, knn_k)  # replicated global top-k
    knn_d2 = -negg  # [N,k]
    win_shard = selg // knn_k
    win_slot = selg % knn_k
    valid_sel = knn_d2 < _FAR
    nn_count = jax.lax.psum(n_local, axis)  # [N]

    mine = valid_sel & (win_shard == my)
    slot = jnp.where(mine, win_slot, 0)
    my_h = jnp.take_along_axis(h_sel, slot, axis=1)
    cap = nm.map_capacity(st)
    idx_local = st.hash_table[my_h]
    mine = mine & (idx_local >= 0)
    knn_idx = jnp.where(mine, idx_local, -1)
    safe = jnp.where(mine, idx_local, cap)

    feats = jnp.where(mine[..., None], st.geo_feats[safe], 0.0)
    cert = jnp.where(mine, st.certainty[safe], 0.0)
    pos = jnp.where(mine[..., None], st.positions[safe], 0.0)
    payload = jnp.concatenate([pos, feats, cert[..., None]], axis=-1)
    # ONE reduce-scatter: each shard receives its chunk's combined rows
    payload_c = jax.lax.psum_scatter(
        payload, axis, scatter_dimension=0, tiled=True
    )  # [N/S, k, 3+F+1]
    nb_pos = payload_c[..., :3]
    feats_c = payload_c[..., 3:-1]
    cert_c = payload_c[..., -1]

    start = my * chunk
    pts_c = jax.lax.dynamic_slice_in_dim(points, start, chunk, 0)
    d2_c = jax.lax.dynamic_slice_in_dim(knn_d2, start, chunk, 0)
    valid_c = jax.lax.dynamic_slice_in_dim(valid_sel, start, chunk, 0)
    nnc_c = jax.lax.dynamic_slice_in_dim(nn_count, start, chunk, 0)

    vecs = pts_c[:, None, :] - nb_pos
    if encode_vecs is not None:
        vecs = encode_vecs(vecs)
    vecs = jnp.where(valid_c[..., None], vecs, 0.0)

    eps = 1e-15
    w = 1.0 / (d2_c + eps)
    w = jnp.where(valid_c, w, 0.0)
    w = jnp.where((nnc_c == 0)[:, None], eps, w)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(valid_c, w, 0.0)

    # full-batch weights for the certainty scatter (replicated compute)
    wf = 1.0 / (knn_d2 + eps)
    wf = jnp.where(valid_sel, wf, 0.0)
    wf = jnp.where((nn_count == 0)[:, None], eps, wf)
    wf = wf / jnp.sum(wf, axis=1, keepdims=True)
    wf = jnp.where(valid_sel, wf, 0.0)

    certainty_q = jnp.sum(cert_c * w, axis=1)
    feat_vec = jnp.concatenate([feats_c, vecs], axis=-1)
    feature = jnp.sum(feat_vec * w[..., None], axis=1)
    return feature, w, nnc_c, certainty_q, knn_idx, wf


def make_spatial_fns(
    mesh: Mesh,
    *,
    feature_dim: int,
    knn_k: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    sigma: float,
    bs: int,
    bs_new: int,
    gradient_decimation: int,
    num_grad_eps: float,
    weight_e: float,
    loss_weight_on: bool,
    lr: float,
    adam_eps: float = 1e-15,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    encode_vecs=None,
    axis: str = "sp",
    loss_type: str = "bce",
    batch_shard="cached",
):
    """Build (insert_fn, query_fn, mapping_fn) over the mesh's shard axis.

    insert_fn(sstate, points, mask, travel, cur_ts, window)
        -> (sstate, new_ratio): each shard claims the points whose voxels it
        owns; disjoint by construction, no collective needed beyond the
        ratio reduction.
    query_fn(sstate, points, travel, cur_ts, window)
        -> SpatialQueryResult with [S,N,k] local knn_idx (leading shard axis).
    mapping_fn(sstate, mlp, pool, travel, cur_ts, window, key, iters,
        mlp_lr_scale) -> (sstate, mlp, losses): the full Adam loop of
        mapper.make_mapping_fn with every map access through the combined
        sharded query; feature grads/updates and certainty scatters stay on
        the owning shard.
    """
    S = mesh.shape[axis]
    rep_specs_state = jax.tree.map(lambda _: P(axis), nm.init_map(2, 2, 1))

    q_kw = dict(
        axis=axis, n_shards=S, nb_offs=nb_offs, resolution=resolution,
        max_valid_dist2=max_valid_dist2, knn_k=knn_k,
        encode_vecs=encode_vecs,
    )

    @jax.jit
    def insert_fn(sstate, points, mask, travel, cur_ts, window):
        def body(sstate, points, mask, travel, cur_ts, window):
            st = _local(sstate)
            my = jax.lax.axis_index(axis)
            own = shard_owner(points, resolution, S) == my
            st2, _ = nm.insert_points(
                st, points, mask & own, resolution, travel, cur_ts, window
            )
            n_new = jax.lax.psum(st2.count - st.count, axis)
            n_in = jnp.sum(mask.astype(jnp.int32))
            ratio = n_new / jnp.maximum(n_in, 1)
            return _boxed(st2), ratio

        return shard_map(
            body, mesh=mesh,
            in_specs=(rep_specs_state, P(), P(), P(), P(), P()),
            out_specs=(rep_specs_state, P()),
        )(sstate, points, mask, travel, cur_ts, window)

    @jax.jit
    def query_fn(sstate, points, travel, cur_ts, window):
        def body(sstate, points, travel, cur_ts, window):
            st = _local(sstate)
            q = _combined_query(
                st, points, travel_dist=travel, cur_ts=cur_ts,
                window=window, **q_kw,
            )
            return q._replace(knn_idx=q.knn_idx[None])

        return shard_map(
            body, mesh=mesh,
            in_specs=(rep_specs_state, P(), P(), P(), P()),
            out_specs=SpatialQueryResult(
                feature=P(), weights=P(), knn_idx=P(axis),
                nn_count=P(), certainty=P(),
            ),
            # outputs ARE replicated (they derive from all_gather'd
            # distances + psum'd payloads); the static VMA checker cannot
            # infer replication through all_gather in this jax version
            check_vma=False,
        )(sstate, points, travel, cur_ts, window)

    bd = max(1, bs // gradient_decimation)
    if batch_shard and bs % S != 0:
        batch_shard = False  # chunking requires bs divisible by S
    # batch_shard: "cached" (default) = one collective probe per call +
    # per-iteration feature-payload exchange; True/"uncached" = chunked
    # math with a full probe per iteration (numerically equal to the
    # replicated body; used by the equivalence test); False = replicated
    # batch-sharded mode: pad the decimated tap set so each shard holds
    # an integral number of complete samples (6 taps each)
    bd_pad = ((bd + S - 1) // S) * S
    chunk = max(1, bs // S)

    @partial(jax.jit, donate_argnums=(0,))
    def mapping_fn(
        sstate, mlp, pool: ReplayPool, travel, cur_ts, window, key,
        iter_count, mlp_lr_scale,
    ):
        def body_cached_chunked(
            sstate, mlp, pool, travel, cur_ts, window, key, iter_count,
            mlp_lr_scale,
        ):
            """Candidate-cached DP x SP mapping: ONE collective probe +
            top-k merge per call freezes the batch's query geometry
            (mirroring mapper._make_cached_mapping_fn); every Adam
            iteration then exchanges only the [bs,k,F] feature payload
            (one psum_scatter) and runs the MLP + losses on its bs/S
            chunk. Per-iteration collective bytes: bs*k*F*4/S received
            per shard; the probe runs once instead of iter_count times."""
            st0 = _local(sstate)
            my = jax.lax.axis_index(axis)
            cap = nm.map_capacity(st0)
            start = my * chunk
            bd_local = max(1, chunk // gradient_decimation)

            key, kb = jax.random.split(key)
            idx = sample_batch_indices(pool, kb, bs, bs_new)
            bvalid = (
                pool.valid[idx] & (idx < pool.size)
            ).astype(jnp.float32)
            from ..mapping.pool import split_rows

            coord_b, sdf_b, w_b, ts_b, _, _ = split_rows(pool.data[idx])

            # ---- one collective probe + merge (frame-constant geometry)
            kd2, h_sel, n_local = _partial_knn(
                st0, coord_b, knn_k,
                nb_offs=nb_offs, resolution=resolution,
                max_valid_dist2=max_valid_dist2, travel_dist=travel,
                cur_ts=cur_ts, window=window, time_filtering=False,
            )
            all_d2 = jax.lax.all_gather(kd2, axis)
            flat = jnp.transpose(all_d2, (1, 0, 2)).reshape(
                bs, S * knn_k
            )
            negg, selg = jax.lax.top_k(-flat, knn_k)
            knn_d2 = -negg
            win_shard = selg // knn_k
            win_slot = selg % knn_k
            valid_sel = knn_d2 < _FAR
            nn_count = jax.lax.psum(n_local, axis)
            mine = valid_sel & (win_shard == my)
            slot = jnp.where(mine, win_slot, 0)
            my_h = jnp.take_along_axis(h_sel, slot, axis=1)
            idx_local = st0.hash_table[my_h]
            mine = mine & (idx_local >= 0)
            knn_idx = jnp.where(mine, idx_local, -1)
            safe = jnp.where(mine, idx_local, cap)

            # frame-constant combined positions -> chunk vectors/weights
            pos = jnp.where(mine[..., None], st0.positions[safe], 0.0)
            pos_c = jax.lax.psum_scatter(
                pos, axis, scatter_dimension=0, tiled=True
            )  # [chunk,k,3]
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk, 0)
            pts_c = sl(coord_b)
            d2_c = sl(knn_d2)
            valid_c = sl(valid_sel)
            nnc_c = sl(nn_count)
            lbl_c, wgt_c, bv_c = sl(sdf_b), sl(w_b), sl(bvalid)

            vec0 = pts_c[:, None, :] - pos_c
            enc0 = encode_vecs(vec0) if encode_vecs is not None else vec0
            enc0 = jnp.where(valid_c[..., None], enc0, 0.0)
            eps = 1e-15
            w_c = 1.0 / (d2_c + eps)
            w_c = jnp.where(valid_c, w_c, 0.0)
            w_c = jnp.where((nnc_c == 0)[:, None], eps, w_c)
            w_c = w_c / jnp.sum(w_c, axis=1, keepdims=True)
            w_c = jnp.where(valid_c, w_c, 0.0)
            encw0 = jnp.sum(enc0 * w_c[..., None], axis=1)  # hoisted

            # full-batch weights for certainty (replicated, once)
            wf = 1.0 / (knn_d2 + eps)
            wf = jnp.where(valid_sel, wf, 0.0)
            wf = jnp.where((nn_count == 0)[:, None], eps, wf)
            wf = wf / jnp.sum(wf, axis=1, keepdims=True)
            wf = jnp.where(valid_sel, wf, 0.0)

            # tap geometry on the chunk's decimated samples (frame-const;
            # taps reuse the center sample's kNN, mapper.py rationale)
            vd = bv_c[::gradient_decimation][:bd_local]
            vec_d = vec0[::gradient_decimation][:bd_local]
            valid_d = valid_c[::gradient_decimation][:bd_local]
            eps3 = jnp.eye(3, dtype=jnp.float32) * num_grad_eps
            tap_off = jnp.concatenate([eps3, -eps3], axis=0)
            tap_vec = vec_d[None] + tap_off[:, None, None, :]  # [6,bd,k,3]
            tap_d2 = jnp.sum(tap_vec * tap_vec, axis=-1)
            tap_valid = valid_d[None] & (tap_d2 <= max_valid_dist2)
            tap_nc = jnp.sum(tap_valid.astype(jnp.int32), axis=-1)
            w_tap = 1.0 / (tap_d2 + eps)
            w_tap = jnp.where(tap_valid, w_tap, 0.0)
            w_tap = jnp.where((tap_nc == 0)[..., None], eps, w_tap)
            w_tap = w_tap / jnp.sum(w_tap, axis=-1, keepdims=True)
            w_tap = jnp.where(tap_valid, w_tap, 0.0)
            enc_tap = (
                encode_vecs(tap_vec) if encode_vecs is not None else tap_vec
            )
            enc_tap = jnp.where(tap_valid[..., None], enc_tap, 0.0)
            enc_tapw = jnp.sum(enc_tap * w_tap[..., None], axis=2)

            from ..mapping.mapper import make_sdf_loss

            sdf_loss_of = make_sdf_loss(
                lbl_c, wgt_c, bv_c,
                loss_type=loss_type, sigma=sigma,
                loss_weight_on=loss_weight_on,
            )
            den_c = jnp.sum(bv_c)
            den_tot = jnp.clip(jax.lax.psum(den_c, axis), 1.0)
            vd_tot = jnp.clip(jax.lax.psum(jnp.sum(vd), axis), 1.0)
            mine3 = mine[..., None]

            def loss_fn(params):
                feats_slab, mlp_p = params
                contrib = jnp.where(mine3, feats_slab[safe], 0.0)
                pay = jax.lax.psum_scatter(
                    contrib, axis, scatter_dimension=0, tiled=True
                )  # [chunk,k,F]
                fw = jnp.sum(pay * w_c[..., None], axis=1)
                feature = jnp.concatenate([fw, encw0], axis=-1)
                pred = dec.sdf(
                    mlp_p, feature, sdf_scale,
                    leaky=mlp_leaky, bf16=mlp_bf16,
                )
                sdf_loss = jax.lax.psum(
                    sdf_loss_of(pred) * den_c, axis
                ) / den_tot

                pay_d = pay[::gradient_decimation][:bd_local]
                fw_tap = jnp.sum(
                    pay_d[None] * w_tap[..., None], axis=2
                )  # [6,bd,F]
                feat_tap = jnp.concatenate([fw_tap, enc_tapw], axis=-1)
                tap_pred = dec.sdf(
                    mlp_p, feat_tap, sdf_scale,
                    leaky=mlp_leaky, bf16=mlp_bf16,
                )  # [6,bd]
                g = jnp.stack(
                    [(tap_pred[0] - tap_pred[3]),
                     (tap_pred[1] - tap_pred[4]),
                     (tap_pred[2] - tap_pred[5])], axis=-1,
                ) / (2 * num_grad_eps)
                gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
                eik = jax.lax.psum(
                    jnp.sum(((gn - 1.0) ** 2) * vd), axis
                ) / vd_tot
                loss = sdf_loss + weight_e * eik
                return loss, (
                    jax.lax.stop_gradient(sdf_loss),
                    jax.lax.stop_gradient(eik),
                )

            grad_fn = jax.grad(loss_fn, has_aux=True)
            zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)
            carry0 = (
                st0.geo_feats, mlp,
                mp.AdamState(
                    jnp.zeros_like(st0.geo_feats),
                    jnp.zeros_like(st0.geo_feats),
                ),
                mp.AdamState(zeros_like(mlp), zeros_like(mlp)),
                key, jnp.zeros((2,), jnp.float32),
            )

            def step(i, carry):
                feats, mlp_p, fa, ma, k, _ = carry
                (g_feats, g_mlp), (sdf_l, eik_l) = grad_fn((feats, mlp_p))
                g_mlp = jax.tree.map(
                    lambda g: jax.lax.psum(g, axis), g_mlp
                )
                t = (i + 1).astype(jnp.float32)
                upd_f, fa = mp._adam_update(g_feats, fa, t, lr, adam_eps)
                feats = feats + upd_f
                upd_m, ma = mp._adam_update(
                    g_mlp, ma, t, lr * mlp_lr_scale, adam_eps
                )
                mlp_p = jax.tree.map(jnp.add, mlp_p, upd_m)
                return (
                    feats, mlp_p, fa, ma, k, jnp.stack([sdf_l, eik_l])
                )

            feats, mlp_out, _, _, _, losses = jax.lax.fori_loop(
                0, iter_count, step, carry0
            )
            # certainty once, scaled by the iteration count (the cached
            # single-chip mapper's exact treatment)
            itf = jnp.maximum(iter_count.astype(jnp.float32), 0.0)
            st = st0._replace(geo_feats=feats)
            st = nm.accumulate_certainty(st, knn_idx, wf * itf, ts_b)
            # taps: every shard knows the FULL batch's winner indices but
            # only its chunk's tap weights -- all_gather the (small)
            # summed tap weights and address the matching chunk-major rows
            tap_rows = jnp.asarray(
                np.concatenate([
                    c * chunk + np.arange(bd_local) * gradient_decimation
                    for c in range(S)
                ]).astype(np.int32)
            )
            w_tap_sum = jnp.sum(w_tap, axis=0)  # [bd_local, k]
            w_tap_full = jax.lax.all_gather(
                w_tap_sum, axis
            ).reshape(S * bd_local, knn_k)
            st = nm.accumulate_certainty(
                st, knn_idx[tap_rows], w_tap_full * itf, None
            )
            return _boxed(st), mlp_out, losses

        def body_sharded_batch(
            sstate, mlp, pool, travel, cur_ts, window, key, iter_count,
            mlp_lr_scale,
        ):
            """DP x SP: the batch is sampled identically on every shard,
            the probe/top-k merge is collective, and the combined payload
            is reduce-scattered so each shard runs the MLP + losses on its
            bs/S chunk only (_combined_query_chunked docstring)."""
            st0 = _local(sstate)

            def query_chunked(st, feats, mlp_p, pts_full):
                feat, w, nnc, certq, knn_idx, wf = _combined_query_chunked(
                    st._replace(geo_feats=feats), pts_full,
                    travel_dist=travel, cur_ts=cur_ts, window=window,
                    **q_kw,
                )
                pred = dec.sdf(
                    mlp_p, feat, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16
                )
                return pred, knn_idx, wf

            def loss_fn(params, st, batch):
                from ..mapping.mapper import make_sdf_loss

                feats, mlp_p = params
                coord, label, weight, bvalid = batch
                my = jax.lax.axis_index(axis)
                start = my * chunk
                sl = lambda a: jax.lax.dynamic_slice_in_dim(
                    a, start, chunk, 0
                )
                pred_c, knn_idx, wf = query_chunked(st, feats, mlp_p, coord)
                lbl_c, wgt_c, bv_c = sl(label), sl(weight), sl(bvalid)
                den_c = jnp.clip(jnp.sum(bv_c), 0.0)
                loss_c = make_sdf_loss(
                    lbl_c, wgt_c, bv_c,
                    loss_type=loss_type, sigma=sigma,
                    loss_weight_on=loss_weight_on,
                )(pred_c)
                # global masked mean: psum(numerator) / psum(live count)
                sdf_loss = jax.lax.psum(loss_c * den_c, axis) / jnp.clip(
                    jax.lax.psum(den_c, axis), 1.0
                )

                # eikonal taps, SAMPLE-MAJOR [bd_pad, 6] so chunks hold
                # complete samples
                xd = coord[::gradient_decimation][:bd]
                vd = bvalid[::gradient_decimation][:bd]
                xd = jnp.pad(xd, ((0, bd_pad - bd), (0, 0)))
                vd = jnp.pad(vd, (0, bd_pad - bd))
                eps3 = jnp.eye(3, dtype=xd.dtype) * num_grad_eps
                tap_off = jnp.concatenate([eps3, -eps3], axis=0)  # [6,3]
                taps = (
                    xd[:, None, :] + tap_off[None]
                ).reshape(bd_pad * 6, 3)
                tap_sdf, tap_idx, tap_wf = query_chunked(
                    st, feats, mlp_p, taps
                )
                t6 = tap_sdf.reshape(bd_pad // S, 6)
                vd_c = jax.lax.dynamic_slice_in_dim(
                    vd, jax.lax.axis_index(axis) * (bd_pad // S),
                    bd_pad // S, 0,
                )
                g = jnp.stack(
                    [(t6[:, 0] - t6[:, 3]), (t6[:, 1] - t6[:, 4]),
                     (t6[:, 2] - t6[:, 5])], axis=-1,
                ) / (2 * num_grad_eps)
                gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
                eik_num = jnp.sum(((gn - 1.0) ** 2) * vd_c)
                eik = jax.lax.psum(eik_num, axis) / jnp.clip(
                    jax.lax.psum(jnp.sum(vd_c), axis), 1.0
                )
                loss = sdf_loss + weight_e * eik
                aux = jax.tree.map(
                    jax.lax.stop_gradient,
                    (knn_idx, wf, tap_idx, tap_wf, sdf_loss, eik),
                )
                return loss, aux

            grad_fn = jax.grad(loss_fn, has_aux=True)
            zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)

            carry0 = (
                st0.geo_feats, mlp,
                mp.AdamState(
                    jnp.zeros_like(st0.geo_feats),
                    jnp.zeros_like(st0.geo_feats),
                ),
                mp.AdamState(zeros_like(mlp), zeros_like(mlp)),
                st0.certainty, st0.ts_update, key,
                jnp.zeros((2,), jnp.float32),
            )

            def step(i, carry):
                feats, mlp_p, fa, ma, certainty, ts_upd, k, _ = carry
                k, kb = jax.random.split(k)
                idx = sample_batch_indices(pool, kb, bs, bs_new)
                bvalid = (
                    pool.valid[idx] & (idx < pool.size)
                ).astype(jnp.float32)
                from ..mapping.pool import split_rows

                coord_b, sdf_b, w_b, ts_b, _, _ = split_rows(pool.data[idx])
                batch = (coord_b, sdf_b, w_b, bvalid)
                st = st0._replace(certainty=certainty, ts_update=ts_upd)
                (g_feats, g_mlp), aux = grad_fn((feats, mlp_p), st, batch)
                # MLP grads are per-chunk partials; the replicated update
                # needs their sum (the feature grads already carry every
                # chunk's contribution via the psum_scatter transpose)
                g_mlp = jax.tree.map(
                    lambda g: jax.lax.psum(g, axis), g_mlp
                )
                knn_idx, w_knn, tap_idx, tap_w, sdf_l, eik_l = aux
                t = (i + 1).astype(jnp.float32)
                upd_f, fa = mp._adam_update(g_feats, fa, t, lr, adam_eps)
                feats = feats + upd_f
                upd_m, ma = mp._adam_update(
                    g_mlp, ma, t, lr * mlp_lr_scale, adam_eps
                )
                mlp_p = jax.tree.map(jnp.add, mlp_p, upd_m)
                st = nm.accumulate_certainty(st, knn_idx, w_knn, ts_b)
                st = nm.accumulate_certainty(st, tap_idx, tap_w, None)
                return (
                    feats, mlp_p, fa, ma, st.certainty, st.ts_update, k,
                    jnp.stack([sdf_l, eik_l]),
                )

            feats, mlp_out, _, _, certainty, ts_upd, _, losses = (
                jax.lax.fori_loop(0, iter_count, step, carry0)
            )
            st_out = st0._replace(
                geo_feats=feats, certainty=certainty, ts_update=ts_upd
            )
            return _boxed(st_out), mlp_out, losses

        def body(sstate, mlp, pool, travel, cur_ts, window, key, iter_count,
                 mlp_lr_scale):
            st0 = _local(sstate)

            def query_sdf(st, feats, mlp_p, pts):
                q = _combined_query(
                    st._replace(geo_feats=feats), pts,
                    travel_dist=travel, cur_ts=cur_ts, window=window, **q_kw,
                )
                pred = dec.sdf(
                    mlp_p, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16
                )
                return pred, q

            def loss_fn(params, st, batch):
                from ..mapping.mapper import make_sdf_loss

                feats, mlp_p = params
                coord, label, weight, bvalid = batch
                pred, q = query_sdf(st, feats, mlp_p, coord)
                sdf_loss = make_sdf_loss(
                    label, weight, bvalid,
                    loss_type=loss_type, sigma=sigma,
                    loss_weight_on=loss_weight_on,
                )(pred)
                xd = coord[::gradient_decimation][:bd]
                vd = bvalid[::gradient_decimation][:bd]
                eps3 = jnp.eye(3, dtype=xd.dtype) * num_grad_eps
                taps = jnp.concatenate(
                    [xd + eps3[0], xd - eps3[0], xd + eps3[1],
                     xd - eps3[1], xd + eps3[2], xd - eps3[2]], axis=0,
                )
                tap_sdf, q_tap = query_sdf(st, feats, mlp_p, taps)
                t = tap_sdf.reshape(6, bd)
                g = jnp.stack(
                    [(t[0] - t[1]), (t[2] - t[3]), (t[4] - t[5])], axis=-1
                ) / (2 * num_grad_eps)
                gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
                eik = jnp.sum(((gn - 1.0) ** 2) * vd) / jnp.clip(
                    jnp.sum(vd), 1.0
                )
                loss = sdf_loss + weight_e * eik
                aux = jax.tree.map(
                    jax.lax.stop_gradient,
                    (q.knn_idx, q.weights, q_tap.knn_idx, q_tap.weights,
                     sdf_loss, eik),
                )
                return loss, aux

            grad_fn = jax.grad(loss_fn, has_aux=True)
            zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)

            carry0 = (
                st0.geo_feats, mlp,
                mp.AdamState(
                    jnp.zeros_like(st0.geo_feats),
                    jnp.zeros_like(st0.geo_feats),
                ),
                mp.AdamState(zeros_like(mlp), zeros_like(mlp)),
                st0.certainty, st0.ts_update, key,
                jnp.zeros((2,), jnp.float32),
            )

            def step(i, carry):
                feats, mlp_p, fa, ma, certainty, ts_upd, k, _ = carry
                k, kb = jax.random.split(k)
                idx = sample_batch_indices(pool, kb, bs, bs_new)
                bvalid = (pool.valid[idx] & (idx < pool.size)).astype(jnp.float32)
                from ..mapping.pool import split_rows

                coord_b, sdf_b, w_b, ts_b, _, _ = split_rows(pool.data[idx])
                batch = (coord_b, sdf_b, w_b, bvalid)
                st = st0._replace(certainty=certainty, ts_update=ts_upd)
                (g_feats, g_mlp), aux = grad_fn(
                    (feats, mlp_p), st, batch
                )
                knn_idx, w_knn, tap_idx, tap_w, sdf_l, eik_l = aux
                t = (i + 1).astype(jnp.float32)
                upd_f, fa = mp._adam_update(g_feats, fa, t, lr, adam_eps)
                feats = feats + upd_f
                upd_m, ma = mp._adam_update(
                    g_mlp, ma, t, lr * mlp_lr_scale, adam_eps
                )
                mlp_p = jax.tree.map(jnp.add, mlp_p, upd_m)
                # certainty scatter: local winners only (knn_idx is -1
                # elsewhere; accumulate_certainty masks those)
                st = nm.accumulate_certainty(st, knn_idx, w_knn, ts_b)
                st = nm.accumulate_certainty(st, tap_idx, tap_w, None)
                return (
                    feats, mlp_p, fa, ma, st.certainty, st.ts_update, k,
                    jnp.stack([sdf_l, eik_l]),
                )

            feats, mlp_out, _, _, certainty, ts_upd, _, losses = (
                jax.lax.fori_loop(0, iter_count, step, carry0)
            )
            st_out = st0._replace(
                geo_feats=feats, certainty=certainty, ts_update=ts_upd
            )
            return _boxed(st_out), mlp_out, losses

        _body = (
            body_cached_chunked if batch_shard == "cached"
            else (body_sharded_batch if batch_shard else body)
        )
        return shard_map(
            _body, mesh=mesh,
            in_specs=(
                rep_specs_state, P(),
                jax.tree.map(lambda _: P(), pool),
                P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(rep_specs_state, P(), P()),
            check_vma=False,  # see query_fn
        )(sstate, mlp, pool, travel, cur_ts, window, key, iter_count,
          mlp_lr_scale)

    return insert_fn, query_fn, mapping_fn


def make_sharded_tracker_fn(
    mesh: Mesh,
    cached_body,  # iekf.make_cached_update_fn(...) result
    *,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    layer_norm: bool = False,
    axis: str = "sp",
):
    """Candidate-cached IESEKF update over the sharded map.

    Odometry is latency-bound (SURVEY §2.3: "odometry pinned to one
    chip"); here the ONE candidate build per frame is collective
    (partial-kNN exchange, same combine as _combined_query but at n_cand
    width) and the ≤max_iteration dense solve then runs replicated on
    every shard — zero per-iteration collectives, identical results
    everywhere.

    update(sstate, mlp, points_imu[S,3], mask, rot0, pos0, rest0, P,
           travel, cur_ts, window) -> (rot, pos, rest, P, ok, n_iter)
    """
    S = mesh.shape[axis]
    C = cached_body.n_cand
    dense_update = cached_body.dense_update
    rep_specs_state = jax.tree.map(lambda _: P(axis), nm.init_map(2, 2, 1))

    @jax.jit
    def update(
        sstate, mlp, points_imu, mask, rot0, pos0, rest0, Pm,
        travel, cur_ts, window,
    ):
        def body(
            sstate, mlp, points_imu, mask, rot0, pos0, rest0, Pm,
            travel, cur_ts, window,
        ):
            st = _local(sstate)
            my = jax.lax.axis_index(axis)
            pc0 = points_imu @ rot0.T + pos0
            kd2, h_sel, _ = _partial_knn(
                st, pc0, C, nb_offs=nb_offs, resolution=resolution,
                max_valid_dist2=max_valid_dist2, travel_dist=travel,
                cur_ts=cur_ts, window=window, time_filtering=True,
            )
            n = pc0.shape[0]
            all_d2 = jax.lax.all_gather(kd2, axis)  # [S,N,C]
            flat = jnp.transpose(all_d2, (1, 0, 2)).reshape(n, S * C)
            negg, selg = jax.lax.top_k(-flat, C)
            cd2 = -negg
            win_shard = selg // C
            win_slot = selg % C
            cvalid = cd2 < _FAR
            mine = cvalid & (win_shard == my)
            slot = jnp.where(mine, win_slot, 0)
            my_h = jnp.take_along_axis(h_sel, slot, axis=1)
            cap = nm.map_capacity(st)
            idx_local = st.hash_table[my_h]
            mine = mine & (idx_local >= 0)
            safe = jnp.where(mine, idx_local, cap)
            feats = st.geo_feats[safe]
            if layer_norm:
                mu = jnp.mean(feats, axis=-1, keepdims=True)
                var = jnp.var(feats, axis=-1, keepdims=True)
                feats = (feats - mu) * jax.lax.rsqrt(var + 1e-5)
            feats = jnp.where(mine[..., None], feats, 0.0)
            pos = jnp.where(mine[..., None], st.positions[safe], 0.0)
            ok_ch = mine[..., None].astype(jnp.float32)
            payload = jnp.concatenate([pos, feats, ok_ch], axis=-1)
            payload = jax.lax.psum(payload, axis)  # [N,C,3+F+1]
            cand_pos = payload[..., :3]
            cand_feat = payload[..., 3:-1]
            cand_valid = payload[..., -1] > 0.5
            # replicated dense iterations (no further collectives)
            return dense_update(
                (cand_pos, cand_feat, cand_valid, None), mlp,
                points_imu, mask, rot0, pos0, rest0, Pm,
            )

        return shard_map(
            body, mesh=mesh,
            in_specs=(rep_specs_state,) + (P(),) * 10,
            out_specs=(P(),) * 6,
            check_vma=False,  # replicated by construction (see query_fn)
        )(sstate, mlp, points_imu, mask, rot0, pos0, rest0, Pm,
          travel, cur_ts, window)

    return update


def make_sharded_certainty_fn(
    mesh: Mesh,
    *,
    resolution: float,
    max_valid_dist2: float,
    axis: str = "sp",
):
    """query_certainty_max over the union of shards (novelty gating)."""
    from ..ops.voxel import neighbor_offsets

    nb = neighbor_offsets(1, 0.0)
    rep_specs_state = jax.tree.map(lambda _: P(axis), nm.init_map(2, 2, 1))

    @jax.jit
    def certainty(sstate, points):
        def body(sstate, points):
            st = _local(sstate)
            c = nm.query_certainty_max(
                st, points, resolution, max_valid_dist2
            )
            return jax.lax.pmax(c, axis)

        return shard_map(
            body, mesh=mesh,
            in_specs=(rep_specs_state, P()),
            out_specs=P(),
        )(sstate, points)

    return certainty


def total_count(sstate: nm.NeuralMapState) -> int:
    """Total live points across shards."""
    return int(np.asarray(sstate.count).sum())
