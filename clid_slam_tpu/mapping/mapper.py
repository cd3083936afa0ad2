"""Map optimization: the online training loop over the neural point map.

Covers the reference Mapper's training path (utils/mapper.py:620-862):
batch sampling from the replay pool, feature query, SDF decode, BCE +
eikonal losses (utils/loss.py:44-62, utils/mapper.py:750-798), numerical
SDF gradient (utils/mapper.py:985-1034), Adam on (neural point features,
decoder MLP), and training-mode certainty accumulation.

TPU-native design:
- the whole per-frame optimization (``iters`` Adam steps) is ONE jitted
  ``lax.fori_loop`` with a dynamic trip count — no host roundtrips between
  iterations; the Adam state is re-initialized each frame exactly like the
  reference, which constructs a fresh optimizer in every ``mapping()`` call
  (utils/mapper.py:634-640);
- gradients w.r.t. the full feature slab arrive as XLA scatter-adds from
  the gather-based query, and dense Adam matches the reference's dense
  Adam over the local feature tensor;
- decoder freezing (slam.py:194-196) is a zero learning-rate on the MLP
  half, so no recompilation when it kicks in.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import decoder as dec
from ..models import neural_map as nm
from ..mapping.pool import ReplayPool, sample_batch_indices


class AdamState(NamedTuple):
    m: any
    v: any


def _adam_update(g, st: AdamState, t, lr, eps=1e-15, b1=0.9, b2=0.999):
    m = jax.tree.map(lambda m_, g_: b1 * m_ + (1 - b1) * g_, st.m, g)
    v = jax.tree.map(lambda v_, g_: b2 * v_ + (1 - b2) * g_**2, st.v, g)
    mh = jax.tree.map(lambda m_: m_ / (1 - b1**t), m)
    vh = jax.tree.map(lambda v_: v_ / (1 - b2**t), v)
    upd = jax.tree.map(lambda m_, v_: -lr * m_ / (jnp.sqrt(v_) + eps), mh, vh)
    return upd, AdamState(m, v)


def make_mapping_fn(
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
    color_on: bool = False,
    sem_on: bool = False,
    weight_i: float = 1.0,
    weight_s: float = 1.0,
    surface_sample_range_m: float = 0.25,
    freespace_label_on: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
    weighted_first: bool = True,
    layer_norm: bool = False,
    as_body: bool = False,
):
    """Build the jitted per-frame map optimization function
    (``as_body=True``: unjitted, for fusion into a larger step).

    Color (intensity/RGB) regression trains a second feature slab + MLP
    sharing the geometric kNN (utils/mapper.py:686-689, 820-830); semantic
    classification trains a third MLP over the geometric features
    (utils/mapper.py:682-685, 800-818)."""

    bd = max(1, bs // gradient_decimation)

    def query_sdf(map_state, feats, mlp, pts, travel_dist, cur_ts, window):
        st = map_state._replace(geo_feats=feats)
        q = nm.query_feature(
            st,
            pts,
            nb_offs,
            resolution,
            max_valid_dist2,
            knn_k,
            travel_dist,
            cur_ts,
            window,
            True,
            rotate_vecs=rotate_vecs,
            encode_vecs=encode_vecs,
            weighted_first=weighted_first,
            layer_norm=layer_norm,
        )
        pred = dec.sdf(mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16)
        if not weighted_first:
            # decode-then-weight (utils/mapper.py:679-744)
            pred = jnp.sum(pred * q.weights, axis=1)
        return pred, q

    def loss_fn(params, map_state, batch, travel_dist, cur_ts, window):
        feats, mlp, cfeats, color_mlp, sem_mlp = params
        coord, label, weight, bvalid, color_lbl, sem_lbl = batch
        pred, q = query_sdf(map_state, feats, mlp, coord, travel_dist, cur_ts, window)

        w_abs = jnp.abs(weight) * bvalid
        label_op = jax.nn.sigmoid(label / sigma)
        bce = optax.sigmoid_binary_cross_entropy(pred / sigma, label_op)
        if loss_weight_on:
            sdf_loss = jnp.sum(w_abs * bce) / bs  # torch weighted-mean semantics
        else:
            sdf_loss = jnp.sum(bce * bvalid) / jnp.clip(jnp.sum(bvalid), 1.0)

        extra = 0.0
        surface_mask = (
            jnp.abs(label) < surface_sample_range_m
        ) * bvalid  # utils/mapper.py:691-693
        if color_on:
            st_c = map_state._replace(color_feats=cfeats)
            cfeat = nm.query_color_feature(st_c._replace(geo_feats=feats), q, feature_dim)
            cpred = dec.regress_color(
                color_mlp, cfeat, leaky=mlp_leaky, bf16=mlp_bf16
            )
            if not weighted_first:  # [N,k,C] -> weighted [N,C]
                cpred = jnp.sum(cpred * q.weights[..., None], axis=1)
            cdiff = jnp.abs(cpred - color_lbl).mean(-1)  # L1
            cw = w_abs if loss_weight_on else bvalid
            color_loss = jnp.sum(cdiff * surface_mask * cw) / jnp.clip(
                jnp.sum(surface_mask * cw), 1.0
            )
            extra = extra + weight_i * color_loss
        if sem_on:
            logp = dec.sem_label_prob(
                sem_mlp, q.feature, leaky=mlp_leaky, bf16=mlp_bf16
            )  # [N,S]
            if not weighted_first:  # [N,k,S] -> weighted [N,S]
                logp = jnp.sum(logp * q.weights[..., None], axis=1)
            lbl_ok = (sem_lbl >= 0) if freespace_label_on else (sem_lbl > 0)
            lm_ = lbl_ok.astype(jnp.float32) * bvalid
            safe_lbl = jnp.clip(sem_lbl, 0)
            nll = -jnp.take_along_axis(logp, safe_lbl[:, None], axis=1)[:, 0]
            sem_loss = jnp.sum(nll * lm_) / jnp.clip(jnp.sum(lm_), 1.0)
            extra = extra + weight_s * sem_loss

        # eikonal on numerically-differentiated decimated samples
        # (utils/mapper.py:696-704, 985-1034: central differences, 6 taps)
        xd = coord[::gradient_decimation][:bd]
        vd = bvalid[::gradient_decimation][:bd]
        eps3 = jnp.eye(3, dtype=xd.dtype) * num_grad_eps
        taps = jnp.concatenate(
            [xd + eps3[0], xd - eps3[0], xd + eps3[1], xd - eps3[1], xd + eps3[2], xd - eps3[2]],
            axis=0,
        )  # [6*bd, 3]
        tap_sdf, q_tap = query_sdf(
            map_state, feats, mlp, taps, travel_dist, cur_ts, window
        )
        t = tap_sdf.reshape(6, bd)
        g = jnp.stack(
            [
                (t[0] - t[1]) / (2 * num_grad_eps),
                (t[2] - t[3]) / (2 * num_grad_eps),
                (t[4] - t[5]) / (2 * num_grad_eps),
            ],
            axis=-1,
        )  # [bd,3]
        # epsilon-safe norm: a sample with no map neighbors has all taps
        # equal -> g = 0 exactly, and d‖g‖/dg = g/‖g‖ would be 0/0 (NaN
        # poisoning the whole MLP gradient on TPU); 1e-20 keeps the
        # backward finite without perturbing real gradient norms
        gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
        eik = jnp.sum(((gn - 1.0) ** 2) * vd) / jnp.clip(jnp.sum(vd), 1.0)

        loss = sdf_loss + weight_e * eik + extra
        aux = (
            jax.lax.stop_gradient(q.knn_idx),
            jax.lax.stop_gradient(q.weights),
            jax.lax.stop_gradient(q_tap.knn_idx),
            jax.lax.stop_gradient(q_tap.weights),
            jax.lax.stop_gradient(sdf_loss),
            jax.lax.stop_gradient(eik),
        )
        return loss, aux

    grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)

    def mapping(
        map_state: nm.NeuralMapState,
        mlp: dec.MLPParams,
        color_mlp: dec.MLPParams,
        sem_mlp: dec.MLPParams,
        pool: ReplayPool,
        travel_dist,
        cur_ts,
        window,
        key,
        iter_count,  # dynamic
        mlp_lr_scale,  # 1.0 normally, 0.0 when the decoder is frozen
    ):
        zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)
        params0 = (
            map_state.geo_feats,
            mlp,
            map_state.color_feats,
            color_mlp,
            sem_mlp,
        )
        carry0 = (
            params0,
            AdamState(zeros_like(params0), zeros_like(params0)),
            map_state.certainty,
            map_state.ts_update,
            key,
            jnp.zeros((2,), jnp.float32),  # (sdf_loss, eik) of last iter
        )

        def body(i, carry):
            params, adam, certainty, ts_upd, k, _ = carry
            k, kb = jax.random.split(k)
            idx = sample_batch_indices(pool, kb, bs, bs_new)
            bvalid = (idx < pool.size).astype(jnp.float32)
            coord = pool.coords[idx]
            label = pool.sdf[idx]
            weight = pool.weight[idx]
            ts = pool.ts[idx]
            color_lbl = pool.color[idx]
            sem_lbl = pool.sem[idx]

            st = map_state._replace(certainty=certainty, ts_update=ts_upd)
            grads, aux = grad_fn(
                params,
                st,
                (coord, label, weight, bvalid, color_lbl, sem_lbl),
                travel_dist,
                cur_ts,
                window,
            )
            knn_idx, w_knn, tap_idx, tap_w, sdf_l, eik_l = aux

            t = (i + 1).astype(jnp.float32)
            # per-group learning rates: features at lr, all MLPs at
            # lr * mlp_lr_scale (freeze support, slam.py:194-196)
            lrs = (lr, lr * mlp_lr_scale, lr, lr * mlp_lr_scale, lr * mlp_lr_scale)
            new_params = []
            new_m, new_v = [], []
            for p_, g_, m_, v_, lr_ in zip(
                params, grads, adam.m, adam.v, lrs
            ):
                upd, st_a = _adam_update(g_, AdamState(m_, v_), t, lr_, adam_eps)
                new_params.append(jax.tree.map(jnp.add, p_, upd))
                new_m.append(st_a.m)
                new_v.append(st_a.v)
            params = tuple(new_params)
            adam = AdamState(tuple(new_m), tuple(new_v))

            # training-mode certainty accumulation (both the main batch and
            # the numerical-gradient taps, as in the reference where every
            # query_feature call in training mode scatters)
            st = nm.accumulate_certainty(st, knn_idx, w_knn, ts)
            st = nm.accumulate_certainty(st, tap_idx, tap_w, None)
            return (
                params,
                adam,
                st.certainty,
                st.ts_update,
                k,
                jnp.stack([sdf_l, eik_l]),
            )

        params, _, certainty, ts_upd, _, losses = jax.lax.fori_loop(
            0, iter_count, body, carry0
        )
        feats, mlp_out, cfeats, color_mlp_out, sem_mlp_out = params
        new_state = map_state._replace(
            geo_feats=feats,
            color_feats=cfeats,
            certainty=certainty,
            ts_update=ts_upd,
        )
        return new_state, mlp_out, color_mlp_out, sem_mlp_out, losses

    if as_body:
        return mapping
    return partial(jax.jit, donate_argnums=(0,))(mapping)


def make_novelty_fn(
    *,
    resolution: float,
    new_certainty_thre: float,
    surface_sample_range_m: float,
):
    """Novelty flags for adaptive-iteration batch mixing
    (utils/mapper.py:404-435): a current-frame sample is "new" when the map
    certainty at its location is low and it lies near the surface."""
    one_cell_mvd2 = 3.0 * (2.0 * resolution) ** 2

    @jax.jit
    def novelty(map_state: nm.NeuralMapState, coords_global, sdf_label, mask):
        cert = nm.query_certainty_max(
            map_state, coords_global, resolution, one_cell_mvd2
        )
        is_new = (
            (cert < new_certainty_thre)
            & (jnp.abs(sdf_label) < surface_sample_range_m * 3.0)
            & mask
        )
        return is_new

    return novelty
