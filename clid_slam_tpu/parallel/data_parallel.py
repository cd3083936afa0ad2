"""Multi-chip parallel mapping over a jax.sharding device mesh.

The reference is strictly single-GPU (slam.py:11 pins CUDA_VISIBLE_DEVICES;
no distributed backend anywhere — SURVEY.md §2.3). This module is new
capability: the map-optimization step (the throughput-bound part of the
pipeline; odometry stays latency-bound on one chip) runs SPMD across a
device mesh:

- **dp axis** — the training batch (replay-pool samples) is sharded across
  devices; each device queries/decodes its shard; feature/MLP gradients are
  combined by the partitioner's all-reduce (psum) since the parameters are
  replicated.
- the per-iteration numerical-gradient taps inherit the batch sharding.

The map feature slab is replicated in round 1 (spatial map-block sharding
with ppermute halo exchange is the next step); gradients of the slab arrive
as scatter-adds which XLA reduces across dp with one psum per step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapping import mapper as mp
from ..mapping.pool import ReplayPool, sample_batch_indices
from ..models import decoder as dec
from ..models import neural_map as nm


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_dp_mapping_fn(
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
    adam_eps: float,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    encode_vecs=None,
):
    """Data-parallel version of mapper.make_mapping_fn: same math, batch
    sharded over the mesh's dp axis via sharding constraints; XLA inserts
    the gradient all-reduce."""
    assert bs % mesh.devices.size == 0, "batch must divide the mesh"
    bd = max(1, bs // gradient_decimation)
    batch_sharding = NamedSharding(mesh, P("dp"))
    batch_sharding2 = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    def constrain(x, s):
        return jax.lax.with_sharding_constraint(x, s)

    def query_sdf(map_state, feats, mlp, pts, travel_dist, cur_ts, window):
        st = map_state._replace(geo_feats=feats)
        q = nm.query_feature(
            st, pts, nb_offs, resolution, max_valid_dist2, knn_k,
            travel_dist, cur_ts, window, True, encode_vecs=encode_vecs,
        )
        pred = dec.sdf(mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16)
        return pred, q

    def loss_fn(feats, mlp, map_state, batch, travel_dist, cur_ts, window):
        import optax

        coord, label, weight, bvalid = batch
        coord = constrain(coord, batch_sharding2)
        pred, q = query_sdf(map_state, feats, mlp, coord, travel_dist, cur_ts, window)

        w_abs = jnp.abs(weight) * bvalid
        label_op = jax.nn.sigmoid(label / sigma)
        bce = optax.sigmoid_binary_cross_entropy(pred / sigma, label_op)
        if loss_weight_on:
            sdf_loss = jnp.sum(w_abs * bce) / jnp.clip(
                jnp.sum(bvalid), 1.0
            )
        else:
            sdf_loss = jnp.sum(bce * bvalid) / jnp.clip(jnp.sum(bvalid), 1.0)

        xd = coord[::gradient_decimation][:bd]
        vd = bvalid[::gradient_decimation][:bd]
        eps3 = jnp.eye(3, dtype=xd.dtype) * num_grad_eps
        taps = jnp.concatenate(
            [xd + eps3[0], xd - eps3[0], xd + eps3[1], xd - eps3[1],
             xd + eps3[2], xd - eps3[2]], axis=0,
        )
        tap_sdf, q_tap = query_sdf(
            map_state, feats, mlp, taps, travel_dist, cur_ts, window
        )
        t = tap_sdf.reshape(6, bd)
        g = jnp.stack(
            [(t[0] - t[1]), (t[2] - t[3]), (t[4] - t[5])], axis=-1
        ) / (2 * num_grad_eps)
        # epsilon-safe norm (see mapper.py: zero-neighbor taps give g = 0)
        gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
        eik = jnp.sum(((gn - 1.0) ** 2) * vd) / jnp.clip(jnp.sum(vd), 1.0)
        loss = sdf_loss + weight_e * eik
        aux = (
            jax.lax.stop_gradient(q.knn_idx),
            jax.lax.stop_gradient(q.weights),
            jax.lax.stop_gradient(q_tap.knn_idx),
            jax.lax.stop_gradient(q_tap.weights),
            jax.lax.stop_gradient(sdf_loss),
            jax.lax.stop_gradient(eik),
        )
        return loss, aux

    grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)

    @partial(jax.jit, donate_argnums=(0,))
    def mapping(
        map_state: nm.NeuralMapState,
        mlp: dec.MLPParams,
        pool: ReplayPool,
        travel_dist,
        cur_ts,
        window,
        key,
        iter_count,
        mlp_lr_scale,
    ):
        feats0 = constrain(map_state.geo_feats, repl)
        zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)
        carry0 = (
            feats0,
            mlp,
            mp.AdamState(jnp.zeros_like(feats0), jnp.zeros_like(feats0)),
            mp.AdamState(zeros_like(mlp), zeros_like(mlp)),
            map_state.certainty,
            map_state.ts_update,
            key,
            jnp.zeros((2,), jnp.float32),
        )

        def body(i, carry):
            feats, mlp_p, fa, ma, certainty, ts_upd, k, _ = carry
            k, kb = jax.random.split(k)
            idx = sample_batch_indices(pool, kb, bs, bs_new)
            idx = constrain(idx, batch_sharding)
            bvalid = (pool.valid[idx] & (idx < pool.size)).astype(jnp.float32)
            rows = pool.data[idx]  # one row gather for all attributes
            from ..mapping.pool import split_rows

            coord, label, weight, ts, _, _ = split_rows(rows)
            coord = constrain(coord, batch_sharding2)

            st = map_state._replace(certainty=certainty, ts_update=ts_upd)
            (g_feats, g_mlp), aux = grad_fn(
                feats, mlp_p, st, (coord, label, weight, bvalid),
                travel_dist, cur_ts, window,
            )
            knn_idx, w_knn, tap_idx, tap_w, sdf_l, eik_l = aux
            g_feats = constrain(g_feats, repl)

            t = (i + 1).astype(jnp.float32)
            upd_f, fa = mp._adam_update(g_feats, fa, t, lr, adam_eps)
            feats = feats + upd_f
            upd_m, ma = mp._adam_update(g_mlp, ma, t, lr * mlp_lr_scale, adam_eps)
            mlp_p = jax.tree.map(jnp.add, mlp_p, upd_m)

            st = nm.accumulate_certainty(st, knn_idx, w_knn, ts)
            st = nm.accumulate_certainty(st, tap_idx, tap_w, None)
            return (
                feats, mlp_p, fa, ma, st.certainty, st.ts_update, k,
                jnp.stack([sdf_l, eik_l]),
            )

        feats, mlp_out, _, _, certainty, ts_upd, _, losses = jax.lax.fori_loop(
            0, iter_count, body, carry0
        )
        new_state = map_state._replace(
            geo_feats=feats, certainty=certainty, ts_update=ts_upd
        )
        return new_state, mlp_out, losses

    return mapping


def shard_batch_pipeline(mesh: Mesh, arrays):
    """Place per-sample arrays with the dp-sharded layout (leading axis
    split across devices)."""
    out = []
    for a in arrays:
        spec = P("dp") if a.ndim == 1 else P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out
