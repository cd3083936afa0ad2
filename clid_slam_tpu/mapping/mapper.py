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
from ..mapping.pool import ReplayPool, sample_batch_indices, split_rows


class AdamState(NamedTuple):
    m: any
    v: any


def _adam_update(g, st: AdamState, t, lr, eps=1e-15, b1=0.9, b2=0.99):
    # betas (0.9, 0.99) — the reference's online-tuned setting
    # (utils/tools.py:251); 0.999 adapts the second moment 10x slower and
    # measurably lags early-frame SDF convergence (phase-lag drift)
    m = jax.tree.map(lambda m_, g_: b1 * m_ + (1 - b1) * g_, st.m, g)
    v = jax.tree.map(lambda v_, g_: b2 * v_ + (1 - b2) * g_**2, st.v, g)
    mh = jax.tree.map(lambda m_: m_ / (1 - b1**t), m)
    vh = jax.tree.map(lambda v_: v_ / (1 - b2**t), v)
    upd = jax.tree.map(lambda m_, v_: -lr * m_ / (jnp.sqrt(v_) + eps), mh, vh)
    return upd, AdamState(m, v)


SUPPORTED_LOSS_TYPES = ("bce", "zhong", "sdf_l1", "sdf_l2")


def pallas_ineligible_reasons(
    *,
    color_on: bool,
    sem_on: bool,
    weighted_first: bool,
    mlp_bf16: bool,
    mlp_leaky: bool,
    loss_type: str,
    feature_dim: int,
    n_hidden: int,
):
    """Static eligibility of the fused Pallas mapping loop
    (ops/pallas_mapping.py); an empty list means the kernel runs. Kept as
    named reasons so the fallback can say WHY (a config that silently
    loses the 15 ms -> 0.2 ms kernel is a perf footgun — VERDICT r4).
    r5 widening: layer_norm, geo_mlp_level<=2, and arbitrary bs are now
    in-kernel, so they no longer appear here."""
    reasons = []
    if color_on:
        reasons.append("color_on")
    if sem_on:
        reasons.append("semantic_on")
    if not weighted_first:
        reasons.append("weighted_first=False")
    if mlp_bf16:
        reasons.append("mlp_bf16")
    if mlp_leaky:
        reasons.append("mlp_leaky_relu")
    if loss_type != "bce":
        reasons.append(f"loss_type={loss_type}")
    if feature_dim != 8:
        reasons.append(f"feature_dim={feature_dim}")
    if n_hidden > 2:
        reasons.append(f"geo_mlp_level={n_hidden}")
    return reasons


def pallas_ineligible_reasons_config(cfg):
    """Eligibility from a Config (for tests / user diagnostics)."""
    return pallas_ineligible_reasons(
        color_on=cfg.color_on,
        sem_on=cfg.semantic_on,
        weighted_first=cfg.weighted_first,
        mlp_bf16=cfg.mlp_bf16,
        mlp_leaky=cfg.mlp_leaky_relu,
        loss_type=cfg.main_loss_type,
        feature_dim=cfg.feature_dim,
        n_hidden=cfg.geo_mlp_level,
    )


def make_sdf_loss(label, weight, bvalid, *, loss_type, sigma, loss_weight_on):
    """Main SDF loss selector (ref utils/loss.py:9-83, utils/mapper.py:750-766).

    Returns ``loss(pred) -> scalar``: the masked mean over live rows
    (fixed-capacity batches carry dead padding rows, so the denominator is
    the live count, not bs). Frame-constant terms (sigmoid targets, zhong
    midpoints, weights) are precomputed at closure-build time so per-Adam-
    iteration work is only the pred-dependent part.

    - ``bce``   (the shipped mode): logits BCE against sigmoid(label/sigma).
    - ``zhong`` : hinge around the half-label midpoint (loss.py:66-83;
      the trunc_dist branch is never used by the reference mapper, which
      passes None at utils/mapper.py:759-761).
    - ``sdf_l1``/``sdf_l2``: weighted |diff| / diff² means (loss.py:9-17;
      always weighted; sdf_scale is 1.0 for non-bce per config.py:902-905).
    """
    w_abs = jnp.abs(weight) * bvalid
    denom = jnp.clip(jnp.sum(bvalid), 1.0)
    w = w_abs if loss_weight_on else bvalid
    if loss_type == "bce":
        label_op = jax.nn.sigmoid(label / sigma)

        def per(pred):
            return optax.sigmoid_binary_cross_entropy(pred / sigma, label_op)

    elif loss_type == "zhong":
        mid = label / 2.0
        mid_abs = jnp.abs(mid)

        def per(pred):
            return jnp.maximum(jnp.abs(pred - mid) - mid_abs, 0.0)

    elif loss_type == "sdf_l1":
        w = w_abs  # diff losses are always weighted (loss.py:9-17)

        def per(pred):
            return jnp.abs(pred - label)

    elif loss_type == "sdf_l2":
        w = w_abs

        def per(pred):
            return (pred - label) ** 2

    else:
        raise ValueError(
            f"unsupported main_loss_type {loss_type!r}; "
            f"choose one of {SUPPORTED_LOSS_TYPES}"
        )

    def loss(pred):
        return jnp.sum(per(pred) * w) / denom

    return loss


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
    cached_query: bool = True,
    resample_every: int = 10,
    as_body: bool = False,
    loss_type: str = "bce",
    gate_moment_io: bool = True,
    max_outer: int = 0,
    dup_independent: bool = False,
    use_pallas: bool = False,
):
    """Build the jitted per-frame map optimization function
    (``as_body=True``: unjitted, for fusion into a larger step).

    Color (intensity/RGB) regression trains a second feature slab + MLP
    sharing the geometric kNN (utils/mapper.py:686-689, 820-830); semantic
    classification trains a third MLP over the geometric features
    (utils/mapper.py:682-685, 800-818).

    ``cached_query=True`` (default) is the TPU-native fast path: ONE batch
    is sampled per frame and its hash-probe + kNN selection + IDW geometry
    are computed ONCE, then reused by every Adam iteration and by the
    numerical-gradient taps. This is valid because neural-point POSITIONS
    are immutable within a frame — only features train — so the candidate
    set, the selected k-NN, and the interpolation weights are constants of
    the frame. The reference re-probes every iteration
    (utils/mapper.py:646-671) because CUDA gathers are cheap; on TPU the
    XLA row-gather costs ~10 ns/row (measured, scripts/profile_gather.py),
    making the per-iteration 81-cell re-probe ~85% of mapping time.
    Deviations vs the reference, both bounded and tested:
    - all ``iter_count`` Adam steps see the same frame batch (fresh batch
      per frame, not per iteration);
    - eikonal taps (±0.04 m) interpolate from the center sample's k-NN
      instead of their own probe (tap offset << voxel size 0.4 m, so the
      neighbor set is almost always identical);
    - training certainty accumulates once, scaled by ``iter_count``
      (identical steady state; certainty is not read inside the loop)."""

    bd = max(1, bs // gradient_decimation)
    if cached_query:
        return _make_cached_mapping_fn(
            feature_dim=feature_dim,
            knn_k=knn_k,
            nb_offs=nb_offs,
            resolution=resolution,
            max_valid_dist2=max_valid_dist2,
            sdf_scale=sdf_scale,
            sigma=sigma,
            bs=bs,
            bs_new=bs_new,
            bd=bd,
            gradient_decimation=gradient_decimation,
            num_grad_eps=num_grad_eps,
            weight_e=weight_e,
            loss_weight_on=loss_weight_on,
            lr=lr,
            adam_eps=adam_eps,
            mlp_leaky=mlp_leaky,
            mlp_bf16=mlp_bf16,
            color_on=color_on,
            sem_on=sem_on,
            weight_i=weight_i,
            weight_s=weight_s,
            surface_sample_range_m=surface_sample_range_m,
            freespace_label_on=freespace_label_on,
            rotate_vecs=rotate_vecs,
            encode_vecs=encode_vecs,
            weighted_first=weighted_first,
            layer_norm=layer_norm,
            resample_every=resample_every,
            as_body=as_body,
            loss_type=loss_type,
            gate_moment_io=gate_moment_io,
            max_outer=max_outer,
            dup_independent=dup_independent,
            use_pallas=use_pallas,
        )

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
        sdf_loss = make_sdf_loss(
            label, weight, bvalid,
            loss_type=loss_type, sigma=sigma, loss_weight_on=loss_weight_on,
        )(pred)

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
            rows = pool.data[idx]  # ONE row gather for all attributes
            bvalid = (pool.valid[idx] & (idx < pool.size)).astype(jnp.float32)
            coord, label, weight, ts, sem_lbl, color_lbl = split_rows(rows)

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


@jax.custom_vjp
def _slab_gather_sorted(slab, idx2d, order, sorted_idx):
    """``slab[idx2d]`` whose TRANSPOSE scatter-adds in SORTED index order.

    The autodiff transpose of a plain gather is a scatter-add with the
    gather's (unsorted, duplicate-heavy) indices — measured at ~2.3 GB/s
    inside the fused mapping loop (r3 trace, 13.6 ms/frame). Sorting the
    cotangent rows by target index first lets the TPU emitter use the
    segmented (sorted) scatter path. ``order``/``sorted_idx`` are the
    frame-constant argsort of ``idx2d.reshape(-1)`` computed once in
    build_cache."""
    del order, sorted_idx
    return slab[idx2d]


def _slab_gather_sorted_fwd(slab, idx2d, order, sorted_idx):
    return slab[idx2d], (slab.shape, order, sorted_idx)


def _slab_gather_sorted_bwd(res, g):
    shape, order, sorted_idx = res
    gf = g.reshape(-1, g.shape[-1])[order]  # cotangents in target order
    grad = jnp.zeros(shape, g.dtype).at[sorted_idx].add(
        gf, indices_are_sorted=True
    )
    return grad, None, None, None


_slab_gather_sorted.defvjp(_slab_gather_sorted_fwd, _slab_gather_sorted_bwd)


def _sorted_scatter_add(exp, n_rows, order, sorted_idx):
    """Sum expanded [bs,k,F] values into their [n_rows, F] work rows using
    the frame-constant sorted permutation (the fast scatter path the
    _slab_gather_sorted transpose uses)."""
    gf = exp.reshape(-1, exp.shape[-1])[order]
    return jnp.zeros((n_rows, exp.shape[-1]), exp.dtype).at[sorted_idx].add(
        gf, indices_are_sorted=True
    )


def _quat_conj_rotate(q, v):
    """Rotate v by the conjugate of quaternion q (wxyz), batched."""
    qc = q * jnp.array([1.0, -1.0, -1.0, -1.0])
    w, u = qc[..., :1], qc[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def _idw(d2, valid, nn_count):
    """Normalized inverse-distance² weights with the reference's
    zero-neighbor epsilon handling (model/neural_points.py:688-706)."""
    eps = 1e-15
    w = 1.0 / (d2 + eps)
    w = jnp.where(valid, w, 0.0)
    w = jnp.where((nn_count == 0)[..., None], eps, w)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(valid, w, 0.0)


def _make_cached_mapping_fn(
    *,
    feature_dim,
    knn_k,
    nb_offs,
    resolution,
    max_valid_dist2,
    sdf_scale,
    sigma,
    bs,
    bs_new,
    bd,
    gradient_decimation,
    num_grad_eps,
    weight_e,
    loss_weight_on,
    lr,
    adam_eps,
    mlp_leaky,
    mlp_bf16,
    color_on,
    sem_on,
    weight_i,
    weight_s,
    surface_sample_range_m,
    freespace_label_on,
    rotate_vecs,
    encode_vecs,
    weighted_first,
    layer_norm,
    resample_every,
    as_body,
    loss_type="bce",
    gate_moment_io=True,
    max_outer=0,
    dup_independent=False,
    use_pallas=False,
):
    """Candidate-cached mapping: see make_mapping_fn docstring.

    ``use_pallas=True`` (with dup_independent) runs the ENTIRE inner Adam
    loop as ONE Pallas TPU kernel (ops/pallas_mapping.py): features +
    moments VMEM-resident in dense feature-major layout, MLP on the MXU,
    manual backward, zero per-iteration HBM traffic. Eligibility is
    checked statically; ineligible configs silently use the XLA loop.

    ``dup_independent=True`` (requires max_outer=1) trains the EXPANDED
    [bs, k, F] kNN references as independent parameters for the frame's
    inner loop and writes back the per-neural-point MEAN delta once at
    the end, instead of gathering/scatter-adding the deduplicated working
    slab every Adam iteration. Adam normalizes gradient magnitude
    (m/sqrt(v)), so an independent step on each duplicate's own gradient
    closely tracks one step on their summed gradient; duplicates of a
    point see near-identical queries, and the final mean removes the
    residual noise. The inner loop becomes PURE dense math -- zero
    gathers, zero scatters (the r4 TPU trace showed the per-iteration
    gather fusion + scatter transpose at 2.3 GB/s costing 13.6 ms/frame).
    Accuracy validated A/B on the bench scenes (see STATUS r4).

    ``max_outer=1`` statically specializes to ONE batch per mapping call
    (iteration count clamped to ``resample_every``; pass
    resample_every >= the adaptive-iteration maximum so the clamp never
    bites). The general path (max_outer=0) keeps the full-capacity
    feature/moment slabs in a dynamic outer fori_loop carry so Adam
    moments survive batch boundaries; the r4 TPU trace showed that carry
    costs ~27 ms/frame in copies of [capacity, F] slabs even when
    n_outer == 1 at runtime — the static single-batch form never
    materializes full-capacity moment slabs at all.

    ``gate_moment_io=False`` is a test hook: always gather and always
    write back the Adam moment slabs instead of skipping the (all-zero)
    first-batch gather and the (dead) last-batch write-back. Must be
    bit-equivalent to the gated path for any n_outer (tests/
    test_round4_fixes.py guards the two lax.cond sites staying in sync)."""

    dec_step = gradient_decimation
    R = max(1, resample_every)  # resample cadence: fresh batch + probe
    # every R Adam steps (R == the reference's per-frame iteration count
    # means a steady-state frame pays exactly ONE probe; R=1 is the
    # reference cadence — fresh batch every step)

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
        mlp_lr_scale,
    ):
        cap = nm.map_capacity(map_state)
        n_iters = jnp.asarray(iter_count, jnp.int32)
        n_outer = (n_iters + R - 1) // R

        W = bs * knn_k  # static bound on distinct map rows a batch touches

        def build_cache(kb):
            """Sample one batch and freeze its query geometry."""
            idx = sample_batch_indices(pool, kb, bs, bs_new)
            rows = pool.data[idx]  # ONE row gather for all attributes
            # sort the batch by voxel hash: random replay indices destroy
            # the probe's HBM locality (measured 10.5 ns/row vs 1.5 ns/row
            # for spatially-coherent queries on the same table); same-voxel
            # points then hit identical buckets back-to-back. Loss sums are
            # permutation-invariant, so this is a free reordering.
            from ..ops.voxel import grid_coords, voxel_hash

            key_h = voxel_hash(
                grid_coords(rows[:, :3], resolution),
                map_state.hash_table.shape[0],
            )
            order = jnp.argsort(key_h)
            idx = idx[order]
            rows = rows[order]
            bvalid = (pool.valid[idx] & (idx < pool.size)).astype(jnp.float32)
            coord, label, weight, ts, sem_lbl, color_lbl = split_rows(rows)

            d2, h, pvalid, mir = nm.neighborhood_probe(
                map_state, coord, nb_offs, resolution, max_valid_dist2,
                travel_dist, cur_ts, window, True,
            )
            nn_count = jnp.sum(pvalid.astype(jnp.int32), axis=-1)
            d2s = jnp.where(pvalid, d2, 9e3)
            neg, sel = jax.lax.top_k(-d2s, knn_k)
            knn_d2 = -neg  # [bs,k]
            h_sel = jnp.take_along_axis(h, sel, axis=1)
            valid = jnp.take_along_axis(pvalid, sel, axis=1)
            dup = (h_sel[:, :, None] == h_sel[:, None, :]) & (
                jnp.tri(knn_k, knn_k, -1, dtype=bool)[None]
            )
            valid = valid & ~jnp.any(dup, axis=-1)
            idx_sel = map_state.hash_table[h_sel]
            valid = valid & (idx_sel >= 0)
            knn_idx = jnp.where(valid, idx_sel, -1)
            safe = jnp.where(valid, idx_sel, cap)  # [bs,k]
            nb_pos = jnp.take_along_axis(
                mir, sel[..., None], axis=1
            )[..., :3]

            vec0 = coord[:, None, :] - nb_pos  # [bs,k,3]
            if rotate_vecs:
                quat_sel = map_state.quats[safe]
                vec0_r = _quat_conj_rotate(quat_sel, vec0)
            else:
                vec0_r = vec0
            w0 = _idw(knn_d2, valid, nn_count)  # [bs,k]
            enc0 = (
                encode_vecs(vec0_r) if encode_vecs is not None else vec0_r
            )
            enc0 = jnp.where(valid[..., None], enc0, 0.0)

            # tap geometry (±eps per axis on decimated rows), reusing the
            # center's k-NN; validity re-gated by the distance cap
            vd = bvalid[::dec_step][:bd]
            vec_d = vec0[::dec_step][:bd]  # [bd,k,3] world-frame offsets
            valid_d = valid[::dec_step][:bd]
            eps3 = jnp.eye(3, dtype=jnp.float32) * num_grad_eps
            tap_off = jnp.concatenate([eps3, -eps3], axis=0)  # [6,3]
            tap_vec = vec_d[None] + tap_off[:, None, None, :]  # [6,bd,k,3]
            tap_d2 = jnp.sum(tap_vec * tap_vec, axis=-1)
            tap_valid = valid_d[None] & (tap_d2 <= max_valid_dist2)
            tap_nc = jnp.sum(tap_valid.astype(jnp.int32), axis=-1)
            w_tap = _idw(tap_d2, tap_valid, tap_nc)  # [6,bd,k]
            if rotate_vecs:
                quat_d = map_state.quats[safe][::dec_step][:bd]
                tap_vec_r = _quat_conj_rotate(quat_d[None], tap_vec)
            else:
                tap_vec_r = tap_vec
            enc_tap = (
                encode_vecs(tap_vec_r)
                if encode_vecs is not None
                else tap_vec_r
            )
            enc_tap = jnp.where(tap_valid[..., None], enc_tap, 0.0)

            # ---- frame-local working set: remap the batch's kNN rows to a
            # compact [W] slab so every Adam iteration runs gathers, grad
            # scatter-adds and moment updates on ~bs*k rows (a few MB,
            # VMEM-scale) instead of the full [capacity, F] slab. The
            # write-back below restores global state once per batch. Exact:
            # Adam moments start at zero each frame, so untouched rows are
            # no-ops in the reference formulation too.
            # compaction via sorted runs over the [bs*k] batch references
            # (the r3 design ran a scatter + cumsum + gather over the FULL
            # [capacity+1] axis -- 6 ms/frame in the r4 trace; everything
            # here is O(bs*k)). Sorting the global rows groups duplicates
            # into contiguous runs; the run id IS the compact local id,
            # ordered by ascending global row exactly like the cumsum
            # formulation, and the sorted order doubles as the
            # _slab_gather_sorted transpose permutation.
            flat_g = safe.reshape(-1)  # [bs*k] global rows (cap=invalid)
            order = jnp.argsort(flat_g)
            sorted_g = flat_g[order]
            newrun = jnp.concatenate([
                jnp.ones((1,), bool), sorted_g[1:] != sorted_g[:-1]
            ])
            runid = jnp.cumsum(newrun.astype(jnp.int32)) - 1  # [bs*k]
            sorted_idx = runid  # ascending local ids, [0,0,..,1,..]
            local_idx = (
                jnp.zeros((flat_g.shape[0],), jnp.int32)
                .at[order].set(runid)
                .reshape(safe.shape)
            )
            src_rows = jnp.full((W,), cap, jnp.int32).at[
                jnp.where(newrun, runid, jnp.int32(2_000_000_000))
            ].set(sorted_g, mode="drop")
            # the encoded-vector half of every feature is frame-constant
            # (it never depends on the trainable features), so its
            # IDW-weighted sum is hoisted out of the Adam loop entirely
            # (weighted_first path; decode-then-weight still needs the
            # per-neighbor tensors)
            encw0 = jnp.sum(enc0 * w0[..., None], axis=1)  # [bs,P]
            enc_tapw = jnp.sum(enc_tap * w_tap[..., None], axis=2)
            return dict(
                bvalid=bvalid, label=label, weight=weight, ts=ts,
                color_lbl=color_lbl, sem_lbl=sem_lbl, valid=valid,
                knn_idx=knn_idx, safe=local_idx, src_rows=src_rows,
                order=order, sorted_idx=sorted_idx,
                w0=w0, enc0=enc0, encw0=encw0, vd=vd,
                w_tap=w_tap, enc_tap=enc_tap, enc_tapw=enc_tapw,
            )

        def make_loss_fn(c, expanded=False):
            w_abs = jnp.abs(c["weight"]) * c["bvalid"]
            sdf_loss_of = make_sdf_loss(
                c["label"], c["weight"], c["bvalid"],
                loss_type=loss_type, sigma=sigma,
                loss_weight_on=loss_weight_on,
            )
            surface_mask = (
                jnp.abs(c["label"]) < surface_sample_range_m
            ) * c["bvalid"]

            def gather_feats(feats_slab):
                # expanded mode: the parameter IS the [bs,k,F] tensor
                f = feats_slab if expanded else _slab_gather_sorted(
                    feats_slab, c["safe"], c["order"], c["sorted_idx"]
                )  # [bs,k,F] per-iteration gather, sorted transpose
                if layer_norm:
                    mu = jnp.mean(f, axis=-1, keepdims=True)
                    var = jnp.var(f, axis=-1, keepdims=True)
                    f = (f - mu) * jax.lax.rsqrt(var + 1e-5)
                return jnp.where(c["valid"][..., None], f, 0.0)

            def decode_weighted(
                mlp_, feats, enc, w, head=dec.sdf, encw=None, **kw
            ):
                if weighted_first:
                    # pre-weighted encoded half (frame-constant, hoisted)
                    fw = jnp.sum(feats * w[..., None], axis=-2)
                    ew = (
                        encw
                        if encw is not None
                        else jnp.sum(enc * w[..., None], axis=-2)
                    )
                    feat = jnp.concatenate([fw, ew], axis=-1)
                    return head(mlp_, feat, **kw)
                fv = jnp.concatenate([feats, enc], axis=-1)
                pred_k = head(mlp_, fv, **kw)
                if pred_k.ndim == w.ndim:  # scalar head
                    return jnp.sum(pred_k * w, axis=-1)
                return jnp.sum(pred_k * w[..., None], axis=-2)

            def loss_fn(params):
                feats_slab, mlp_, cfeats_slab, color_mlp_, sem_mlp_ = params
                feats = gather_feats(feats_slab)
                pred = decode_weighted(
                    mlp_, feats, c["enc0"], c["w0"], head=dec.sdf,
                    encw=c["encw0"],
                    sdf_scale=sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16,
                )
                # masked mean over LIVE rows (the reference divides by bs
                # with all-valid batches, utils/mapper.py:760; the stripe
                # pool leaves dead padding rows in batches, so /bs would
                # silently deflate the loss scale)
                sdf_loss = sdf_loss_of(pred)

                extra = 0.0
                if color_on:
                    cf = cfeats_slab if expanded else _slab_gather_sorted(
                        cfeats_slab, c["safe"], c["order"], c["sorted_idx"]
                    )
                    cf = jnp.where(c["valid"][..., None], cf, 0.0)
                    cpred = decode_weighted(
                        color_mlp_, cf, c["enc0"], c["w0"],
                        head=_color_head, encw=c["encw0"],
                        leaky=mlp_leaky, bf16=mlp_bf16,
                    )
                    cdiff = jnp.abs(cpred - c["color_lbl"]).mean(-1)
                    cw = w_abs if loss_weight_on else c["bvalid"]
                    color_loss = jnp.sum(
                        cdiff * surface_mask * cw
                    ) / jnp.clip(jnp.sum(surface_mask * cw), 1.0)
                    extra = extra + weight_i * color_loss
                if sem_on:
                    logp = decode_weighted(
                        sem_mlp_, feats, c["enc0"], c["w0"],
                        head=dec.sem_label_prob, encw=c["encw0"],
                        leaky=mlp_leaky, bf16=mlp_bf16,
                    )  # [bs,S]
                    lbl_ok = (
                        (c["sem_lbl"] >= 0)
                        if freespace_label_on
                        else (c["sem_lbl"] > 0)
                    )
                    lm_ = lbl_ok.astype(jnp.float32) * c["bvalid"]
                    safe_lbl = jnp.clip(c["sem_lbl"], 0)
                    nll = -jnp.take_along_axis(
                        logp, safe_lbl[:, None], axis=1
                    )[:, 0]
                    sem_loss = jnp.sum(nll * lm_) / jnp.clip(
                        jnp.sum(lm_), 1.0
                    )
                    extra = extra + weight_s * sem_loss

                # eikonal via the 6 cached taps (gather-free: reuses feats)
                feats_d = feats[::dec_step][:bd]  # [bd,k,F]
                tap_pred = decode_weighted(
                    mlp_,
                    jnp.broadcast_to(feats_d[None], (6,) + feats_d.shape),
                    c["enc_tap"], c["w_tap"], head=dec.sdf,
                    encw=c["enc_tapw"],
                    sdf_scale=sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16,
                )  # [6,bd]
                g = jnp.stack(
                    [
                        (tap_pred[0] - tap_pred[3]) / (2 * num_grad_eps),
                        (tap_pred[1] - tap_pred[4]) / (2 * num_grad_eps),
                        (tap_pred[2] - tap_pred[5]) / (2 * num_grad_eps),
                    ],
                    axis=-1,
                )
                gn = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-20)
                eik = jnp.sum(((gn - 1.0) ** 2) * c["vd"]) / jnp.clip(
                    jnp.sum(c["vd"]), 1.0
                )
                loss = sdf_loss + weight_e * eik + extra
                return loss, (
                    jax.lax.stop_gradient(sdf_loss),
                    jax.lax.stop_gradient(eik),
                )

            return loss_fn

        mlps0 = (mlp, color_mlp, sem_mlp)
        zeros_like = lambda tr: jax.tree.map(jnp.zeros_like, tr)

        _pallas_cache = {}

        def _run_pallas_loop(c, f0, mlp_, inner_n, mlp_lr_scale):
            """Kernel-layout marshalling around ops/pallas_mapping.

            Pads the batch columns to a chunk multiple (arbitrary bs —
            padded columns carry zero weights, so they are loss- and
            gradient-dead), permutes the decimated tap rows to the front
            (kernel contract), and packs the MLP params in the kernel's
            [in, out] / transposed-output orientation."""
            import numpy as _np

            from ..ops.pallas_mapping import make_pallas_map_loop

            K_, F_ = knn_k, feature_dim
            P_ = c["encw0"].shape[1]
            H_ = mlp_.weights[0].shape[1]
            NH_ = len(mlp_.weights)
            BD_ = ((bd + 127) // 128) * 128
            chunk_ = min(4096, ((bs + 127) // 128) * 128)
            BSP = ((bs + chunk_ - 1) // chunk_) * chunk_
            if "run" not in _pallas_cache:
                _pallas_cache["run"] = make_pallas_map_loop(
                    bs=BSP, knn_k=K_, feature_dim=F_, pos_dim=P_,
                    hidden=H_, bd=bd, dec_step=dec_step,
                    sdf_scale=sdf_scale, sigma=sigma, lr=lr,
                    adam_eps=adam_eps, weight_e=weight_e,
                    num_grad_eps=num_grad_eps,
                    chunk=chunk_, n_hidden=NH_, layer_norm=layer_norm,
                    # interpreter off-TPU so CPU tests exercise the same
                    # marshalling + kernel math
                    interpret=jax.default_backend() != "tpu",
                )
                tap_rows = _np.arange(0, bs, dec_step)[:bd]
                rest = _np.setdiff1d(_np.arange(bs), tap_rows)
                perm = _np.concatenate([tap_rows, rest]).astype(_np.int32)
                _pallas_cache["perm"] = jnp.asarray(perm)
                _pallas_cache["inv"] = jnp.asarray(
                    _np.argsort(perm).astype(_np.int32)
                )
            run_k = _pallas_cache["run"]
            perm = _pallas_cache["perm"]
            inv = _pallas_cache["inv"]

            f0p = f0[perm]  # [bs,k,F] tap rows leading
            fT = jnp.zeros((K_ * F_, BSP), jnp.float32).at[:, :bs].set(
                f0p.transpose(1, 2, 0).reshape(K_ * F_, bs)
            )
            w0p = c["w0"][perm]
            encp = c["encw0"][perm]
            lblp = c["label"][perm]
            wgtp = c["weight"][perm]
            bvp = c["bvalid"][perm]
            label_op = jax.nn.sigmoid(lblp / sigma)
            wsel = (
                jnp.abs(wgtp) * bvp if loss_weight_on else bvp
            )
            w0T = jnp.zeros((8, BSP), jnp.float32).at[:K_, :bs].set(w0p.T)
            encw0T = jnp.zeros((8, BSP), jnp.float32).at[:P_, :bs].set(
                encp.T
            )
            rowsT = (
                jnp.zeros((8, BSP), jnp.float32)
                .at[0, :bs].set(label_op).at[1, :bs].set(wsel)
            )
            ru = lambda x: ((x + 7) // 8) * 8
            wtapT = jnp.zeros(
                (ru(6 * K_), BD_), jnp.float32
            ).at[: 6 * K_, :bd].set(
                c["w_tap"].transpose(0, 2, 1).reshape(6 * K_, bd)
            )
            enctapwT = jnp.zeros(
                (ru(6 * P_), BD_), jnp.float32
            ).at[: 6 * P_, :bd].set(
                c["enc_tapw"].transpose(0, 2, 1).reshape(6 * P_, bd)
            )
            vdT = jnp.zeros((8, BD_), jnp.float32).at[0, :bd].set(c["vd"])
            W1p = jnp.zeros((16, H_), jnp.float32).at[: F_ + P_].set(
                mlp_.weights[0]
            )
            mlp_parts = [W1p, mlp_.biases[0][:, None]]
            if NH_ == 2:
                mlp_parts += [mlp_.weights[1], mlp_.biases[1][:, None]]
            WoutT8 = jnp.zeros((8, H_), jnp.float32).at[0].set(
                mlp_.w_out[:, 0]
            )
            mlp_parts += [WoutT8, mlp_.b_out.reshape(1, 1)]
            denom = jnp.clip(jnp.sum(bvp), 1.0)
            eik_den = jnp.clip(jnp.sum(c["vd"]), 1.0)

            fT2, mlp2, losses = run_k(
                fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT,
                tuple(mlp_parts),
                inner_n, lr * mlp_lr_scale, 1.0 / denom, 1.0 / eik_den,
            )
            f_new = (
                fT2[:, :bs].reshape(K_, F_, bs).transpose(2, 0, 1)[inv]
            )
            weights_new = [mlp2[0][: F_ + P_]]
            biases_new = [mlp2[1][:, 0]]
            if NH_ == 2:
                weights_new.append(mlp2[2])
                biases_new.append(mlp2[3][:, 0])
            mlp_new = dec.MLPParams(
                weights=weights_new,
                biases=biases_new,
                w_out=mlp2[-2][0][:, None],
                b_out=mlp2[-1].reshape(mlp_.b_out.shape),
            )
            return f_new, mlp_new, losses.reshape(2)

        def make_inner(c, o_base, expanded=False):
            grad_fn = jax.grad(make_loss_fn(c, expanded), has_aux=True)

            def inner(i, c2):
                (wg, wc, mg, mc, vg, vc), mlps, mlp_adam, _ = c2
                mlp_g, color_g, sem_g = mlps
                grads, (sdf_l, eik_l) = grad_fn(
                    (wg, mlp_g, wc, color_g, sem_g)
                )
                t = (o_base + i + 1).astype(jnp.float32)
                upd_g, a_g = _adam_update(
                    grads[0], AdamState(mg, vg), t, lr, adam_eps
                )
                upd_c, a_c = _adam_update(
                    grads[2], AdamState(mc, vc), t, lr, adam_eps
                )
                mlp_grads = (grads[1], grads[3], grads[4])
                upd_m, a_m = _adam_update(
                    mlp_grads, mlp_adam, t, lr * mlp_lr_scale, adam_eps
                )
                new_mlps = jax.tree.map(jnp.add, mlps, upd_m)
                return (
                    (wg + upd_g, wc + upd_c, a_g.m, a_c.m, a_g.v, a_c.v),
                    new_mlps,
                    a_m,
                    jnp.stack([sdf_l, eik_l]),
                )

            return inner

        def accumulate_cert(c, inner_n, certainty, ts_upd):
            # certainty + update-ts once per batch, scaled by its step
            # count (the reference scatters per query_feature call; same
            # batch x N steps == one scatter of N*w --
            # model/neural_points.py:708-737)
            itf = jnp.maximum(inner_n.astype(jnp.float32), 0.0)
            st = nm.accumulate_certainty(
                map_state._replace(certainty=certainty, ts_update=ts_upd),
                c["knn_idx"], c["w0"] * itf, c["ts"],
            )
            tap_idx_d = c["knn_idx"][::dec_step][:bd]
            tap_w_sum = jnp.sum(c["w_tap"], axis=0) * itf  # [bd,k]
            return nm.accumulate_certainty(st, tap_idx_d, tap_w_sum, None)

        def _pallas_eligible(mlp_):
            if not use_pallas:
                return False
            reasons = pallas_ineligible_reasons(
                color_on=color_on, sem_on=sem_on,
                weighted_first=weighted_first, mlp_bf16=mlp_bf16,
                mlp_leaky=mlp_leaky, loss_type=loss_type,
                feature_dim=feature_dim, n_hidden=len(mlp_.weights),
            )
            if reasons:
                import warnings

                warnings.warn(
                    "mapping Pallas fast path DISABLED for this config "
                    f"({', '.join(reasons)}); falling back to the XLA "
                    "loop (~15 ms/frame slower at bench shapes)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return False
            return True

        if max_outer == 1 and dup_independent:
            # expanded-duplicates path: pure dense inner loop (docstring)
            key, kb = jax.random.split(key)
            c = build_cache(kb)
            work0_g = map_state.geo_feats[c["src_rows"]]
            f0 = work0_g[c["safe"]]  # [bs,k,F]
            if color_on:
                work0_c = map_state.color_feats[c["src_rows"]]
                c0 = work0_c[c["safe"]]  # [bs,k,Fc]
            else:
                # color off: the loss never reads color features, so give
                # the loop a [1,1] dummy instead of training a dead
                # [bs,k,1] channel (measured 6 ms/frame of pure Adam
                # waste in the r4 trace)
                c0 = jnp.zeros((1, 1), jnp.float32)
            counts = _sorted_scatter_add(
                jnp.ones(c["safe"].shape + (1,), jnp.float32),
                W, c["order"], c["sorted_idx"],
            )  # [W,1] uses per work row (frame-constant)
            work = (
                f0, c0,
                jnp.zeros_like(f0), jnp.zeros_like(c0),
                jnp.zeros_like(f0), jnp.zeros_like(c0),
            )
            inner_n = jnp.minimum(n_iters, R)
            if _pallas_eligible(mlp):
                f_new, mlp_new, losses = _run_pallas_loop(
                    c, f0, mlp, inner_n, mlp_lr_scale,
                )
                work = (f_new, c0) + work[2:]
                mlps = (mlp_new, color_mlp, sem_mlp)
            else:
                work, mlps, _, losses = jax.lax.fori_loop(
                    0, inner_n, make_inner(c, jnp.int32(0), expanded=True),
                    (
                        work, mlps0,
                        AdamState(zeros_like(mlps0), zeros_like(mlps0)),
                        jnp.zeros((2,), jnp.float32),
                    ),
                )
            rows_g = work0_g + _sorted_scatter_add(
                work[0] - f0, W, c["order"], c["sorted_idx"]
            ) / jnp.clip(counts, 1.0)
            feats = (
                map_state.geo_feats
                .at[c["src_rows"]].set(rows_g, indices_are_sorted=True)
                .at[cap].set(0.0)
            )
            if color_on:
                rows_c = work0_c + _sorted_scatter_add(
                    work[1] - c0, W, c["order"], c["sorted_idx"]
                ) / jnp.clip(counts, 1.0)
                cfeats = (
                    map_state.color_feats
                    .at[c["src_rows"]].set(rows_c, indices_are_sorted=True)
                    .at[cap].set(0.0)
                )
            else:
                cfeats = map_state.color_feats
            st = accumulate_cert(
                c, inner_n, map_state.certainty, map_state.ts_update
            )
            new_state = map_state._replace(
                geo_feats=feats,
                color_feats=cfeats,
                certainty=st.certainty,
                ts_update=st.ts_update,
            )
            mlp_out, color_mlp_out, sem_mlp_out = mlps
            return new_state, mlp_out, color_mlp_out, sem_mlp_out, losses

        if max_outer == 1:
            # static single-batch path: no outer loop, no full-capacity
            # moment slabs -- work buffers are [W, F] throughout
            key, kb = jax.random.split(key)
            c = build_cache(kb)
            work = (
                map_state.geo_feats[c["src_rows"]],
                map_state.color_feats[c["src_rows"]],
                jnp.zeros((W, map_state.geo_feats.shape[1]), jnp.float32),
                jnp.zeros((W, map_state.color_feats.shape[1]), jnp.float32),
                jnp.zeros((W, map_state.geo_feats.shape[1]), jnp.float32),
                jnp.zeros((W, map_state.color_feats.shape[1]), jnp.float32),
            )
            inner_n = jnp.minimum(n_iters, R)
            work, mlps, _, losses = jax.lax.fori_loop(
                0, inner_n, make_inner(c, jnp.int32(0)),
                (
                    work, mlps0,
                    AdamState(zeros_like(mlps0), zeros_like(mlps0)),
                    jnp.zeros((2,), jnp.float32),
                ),
            )
            feats = (
                map_state.geo_feats
                .at[c["src_rows"]].set(work[0], indices_are_sorted=True)
                .at[cap].set(0.0)
            )
            cfeats = (
                map_state.color_feats
                .at[c["src_rows"]].set(work[1], indices_are_sorted=True)
                .at[cap].set(0.0)
            )
            st = accumulate_cert(
                c, inner_n, map_state.certainty, map_state.ts_update
            )
            new_state = map_state._replace(
                geo_feats=feats,
                color_feats=cfeats,
                certainty=st.certainty,
                ts_update=st.ts_update,
            )
            mlp_out, color_mlp_out, sem_mlp_out = mlps
            return new_state, mlp_out, color_mlp_out, sem_mlp_out, losses

        # slab Adam moments live as full slabs in the outer carry so they
        # persist across batch boundaries exactly like one torch.Adam per
        # mapping() call (utils/tools.py:251, utils/mapper.py:634); each
        # outer gathers/scatters only the working rows
        slabs0 = (
            map_state.geo_feats,
            map_state.color_feats,
            jnp.zeros_like(map_state.geo_feats),
            jnp.zeros_like(map_state.color_feats),
            jnp.zeros_like(map_state.geo_feats),
            jnp.zeros_like(map_state.color_feats),
        )  # (geo, color, m_geo, m_color, v_geo, v_color)
        carry0 = (
            slabs0,
            mlps0,
            AdamState(zeros_like(mlps0), zeros_like(mlps0)),
            map_state.certainty,
            map_state.ts_update,
            key,
            jnp.zeros((2,), jnp.float32),
        )

        def outer_body(o, carry):
            slabs, mlps, mlp_adam, certainty, ts_upd, k, _ = carry
            k, kb = jax.random.split(k)
            c = build_cache(kb)
            # extract the batch's working slabs (one [W,F] gather per slab;
            # every Adam iteration below touches only these). The four
            # moment slabs are all-zero on the first outer batch (fresh
            # Adam per mapping call), so their gathers are gated — in the
            # steady state (n_outer == 1) they never run.
            first = (o == 0) if gate_moment_io else jnp.bool_(False)
            work_pc = tuple(s[c["src_rows"]] for s in slabs[:2])
            work_mv = jax.lax.cond(
                first,
                lambda s: tuple(
                    jnp.zeros((W,) + x.shape[1:], x.dtype)
                    for x in s
                ),
                lambda s: tuple(x[c["src_rows"]] for x in s),
                slabs[2:],
            )
            work = work_pc + work_mv
            inner_n = jnp.minimum(R, n_iters - o * R)
            work, mlps, mlp_adam, losses = jax.lax.fori_loop(
                0, inner_n, make_inner(c, o * R),
                (work, mlps, mlp_adam, jnp.zeros((2,))),
            )
            # write back (duplicate src_rows only at the sentinel, zeroed).
            # Moment slabs only feed the NEXT outer batch; skip their
            # write-back on the final one (always, in the steady state)
            last = (
                ((o + 1) * R >= n_iters)
                if gate_moment_io
                else jnp.bool_(False)
            )
            slabs_pc = tuple(
                s.at[c["src_rows"]].set(w, indices_are_sorted=True)
                .at[cap].set(0.0)
                for s, w in zip(slabs[:2], work[:2])
            )
            slabs_mv = jax.lax.cond(
                last,
                lambda sw: sw[0],
                lambda sw: tuple(
                    s.at[c["src_rows"]].set(w, indices_are_sorted=True)
                .at[cap].set(0.0)
                    for s, w in zip(sw[0], sw[1])
                ),
                (slabs[2:], work[2:]),
            )
            slabs = slabs_pc + slabs_mv

            st = accumulate_cert(c, inner_n, certainty, ts_upd)
            return (
                slabs, mlps, mlp_adam,
                st.certainty, st.ts_update, k, losses,
            )

        (
            slabs, mlps, _, certainty, ts_upd, _, losses
        ) = jax.lax.fori_loop(0, n_outer, outer_body, carry0)
        feats, cfeats = slabs[0], slabs[1]
        mlp_out, color_mlp_out, sem_mlp_out = mlps
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


def _color_head(params, feature, **kw):
    return dec.regress_color(params, feature, **kw)


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
