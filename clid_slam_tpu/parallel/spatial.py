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
- **Replicated queries, local probes, collective combine.** Query points are
  replicated. Each shard probes its local hash for all K neighborhood cells
  (one [H,4] mirror row-gather, same as the single-chip path). Per (query,
  cell) slot the best candidate across shards is selected with two ``pmin``s
  (min-d², then winner-shard tie-break) and combined with one masked
  ``psum`` of the winning mirror rows. kNN selection, IDW weights, and the
  decoder then run replicated on the combined candidates.
- **Feature gathers/scatters stay shard-local.** Only the winning slots'
  features are psum-combined ([N,k,F]); the loss consumes the combined
  features, so autodiff routes each shard's gradient back through its own
  masked gather to its own slab — the psum transpose is free (broadcast).
  Certainty scatter-adds are applied by each shard to its own winners.

Per-batch collective traffic (bs=16k, K=33 cells, k=6, F=8):
~psum [N,K,4] (8.6 MB) + 2×pmin [N,K] + psum [N,k,F+4] (3 MB) — a few ms
on one ICI hop, amortized over 10-20 Adam iterations per frame.
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
    Runs inside shard_map; differentiable wrt st.geo_feats (shard-local)."""
    my = jax.lax.axis_index(axis)
    d2, h, valid, mir = nm.neighborhood_probe(
        st, points, nb_offs, resolution, max_valid_dist2,
        travel_dist, cur_ts, window, time_filtering,
    )
    d2m = jnp.where(valid, d2, _FAR)
    best = jax.lax.pmin(d2m, axis)  # [N,K] min over shards
    won0 = (d2m <= best) & valid
    winner = jax.lax.pmin(
        jnp.where(won0, my, n_shards).astype(jnp.int32), axis
    )
    won = won0 & (winner == my)
    mir_c = jax.lax.psum(
        jnp.where(won[..., None], mir, 0.0), axis
    )  # [N,K,4] winning rows
    validc = best < _FAR

    nn_count = jnp.sum(validc.astype(jnp.int32), axis=-1)

    d2_for_sort = jnp.where(validc, best, _FAR)
    neg_top, sel = jax.lax.top_k(-d2_for_sort, knn_k)  # replicated
    knn_d2 = -neg_top
    valid_sel = jnp.take_along_axis(validc, sel, axis=1)
    win_sel = jnp.take_along_axis(winner, sel, axis=1)  # [N,k]
    h_sel = jnp.take_along_axis(h, sel, axis=1)  # local buckets (same cells)
    # dedupe identical candidates: same winning shard AND same bucket there
    # means the same physical point surfaced via two probed cells
    dup = (
        (win_sel[:, :, None] == win_sel[:, None, :])
        & (h_sel[:, :, None] == h_sel[:, None, :])
        & jnp.tri(knn_k, knn_k, -1, dtype=bool)[None]
    )
    valid_sel = valid_sel & ~jnp.any(dup, axis=-1)

    mine_sel = valid_sel & (win_sel == my)
    cap = nm.map_capacity(st)
    idx_local = st.hash_table[h_sel]
    mine_sel = mine_sel & (idx_local >= 0)
    knn_idx = jnp.where(mine_sel, idx_local, -1)
    safe = jnp.where(mine_sel, idx_local, cap)

    feats = jnp.where(mine_sel[..., None], st.geo_feats[safe], 0.0)
    cert = jnp.where(mine_sel, st.certainty[safe], 0.0)
    contrib = jnp.concatenate([feats, cert[..., None]], axis=-1)
    contrib = jax.lax.psum(contrib, axis)  # [N,k,F+1]
    feats_c, cert_c = contrib[..., :-1], contrib[..., -1]

    nb_pos = jnp.take_along_axis(mir_c, sel[..., None], axis=1)[..., :3]
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
        )(sstate, points, travel, cur_ts, window)

    bd = max(1, bs // gradient_decimation)

    @partial(jax.jit, donate_argnums=(0,))
    def mapping_fn(
        sstate, mlp, pool: ReplayPool, travel, cur_ts, window, key,
        iter_count, mlp_lr_scale,
    ):
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
                import optax

                feats, mlp_p = params
                coord, label, weight, bvalid = batch
                pred, q = query_sdf(st, feats, mlp_p, coord)
                w_abs = jnp.abs(weight) * bvalid
                label_op = jax.nn.sigmoid(label / sigma)
                bce = optax.sigmoid_binary_cross_entropy(
                    pred / sigma, label_op
                )
                if loss_weight_on:
                    sdf_loss = jnp.sum(w_abs * bce) / jnp.clip(
                        jnp.sum(bvalid), 1.0
                    )
                else:
                    sdf_loss = jnp.sum(bce * bvalid) / jnp.clip(
                        jnp.sum(bvalid), 1.0
                    )
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

        return shard_map(
            body, mesh=mesh,
            in_specs=(
                rep_specs_state, P(),
                jax.tree.map(lambda _: P(), pool),
                P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(rep_specs_state, P(), P()),
        )(sstate, mlp, pool, travel, cur_ts, window, key, iter_count,
          mlp_lr_scale)

    return insert_fn, query_fn, mapping_fn


def total_count(sstate: nm.NeuralMapState) -> int:
    """Total live points across shards."""
    return int(np.asarray(sstate.count).sum())
