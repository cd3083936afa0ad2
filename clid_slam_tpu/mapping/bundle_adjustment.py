"""Sliding-window bundle adjustment: joint pose + map-feature refinement.

Capabilities of Mapper.bundle_adjustment (utils/mapper.py:866-965): take the
surface (endpoint) samples from the replay pool, re-transform them with
per-frame poses parameterized on se(3), and minimize the squared decoded SDF
at those points by Adam over (window poses, neural point features). The
reference leans on pypose's SE3 autograd; here the se(3) exponential map
(utils/lie.py) is differentiated by JAX directly, and the whole optimization
is one jitted fori_loop.

Differences kept deliberately:
- the "surface sample" selection is a masked uniform draw over the pool
  (endpoint samples are identified by sdf_label == 0, as in
  utils/mapper.py:526-543); non-surface draws get zero weight instead of
  being rejected;
- pose updates are applied as local corrections T(ts) = T0(ts) @ exp(delta),
  which is better conditioned than optimizing full-pose log coordinates.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import decoder as dec
from ..models import neural_map as nm
from ..utils import lie
from .mapper import AdamState, _adam_update
from .pool import ReplayPool


def make_ba_fn(
    *,
    feature_dim: int,
    knn_k: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    window_size: int,
    ba_bs: int,
    lr_pose: float,
    lr_map: float,
    adam_eps: float = 1e-15,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
):
    @partial(jax.jit, donate_argnums=(0,))
    def bundle_adjust(
        map_state: nm.NeuralMapState,
        mlp: dec.MLPParams,
        pool: ReplayPool,
        poses0,  # [W,4,4] f32: the sliding window of poses (latest last)
        window_ts0,  # scalar i32: frame id of poses0[0]
        travel_dist,
        cur_ts,
        window,
        key,
        iter_count,
    ) -> Tuple[nm.NeuralMapState, jnp.ndarray]:
        def loss_fn(params, key_b):
            deltas, feats = params  # [W,6], [C+1,F]
            corr = lie.se3_exp(deltas)  # [W,4,4]
            poses = jnp.einsum("wij,wjk->wik", poses0, corr)

            idx = jax.random.randint(
                key_b, (ba_bs,), 0, jnp.maximum(pool.size, 1)
            )
            from .pool import split_rows

            world, lbl, _, ts, _, _ = split_rows(pool.data[idx])
            # surface endpoints within the window only
            w_idx = jnp.clip(ts - window_ts0, 0, window_size - 1)
            in_window = (ts >= window_ts0) & (idx < pool.size) & pool.valid[idx]
            is_surface = lbl == 0.0
            sel = (in_window & is_surface).astype(jnp.float32)

            # sensor-frame coords recomputed as T0⁻¹·world (the pool no
            # longer stores them; T0 = the pose the sample was built with)
            T0 = poses0[w_idx]  # [B,4,4]
            local = jnp.einsum(
                "bji,bj->bi", T0[:, :3, :3], world - T0[:, :3, 3]
            )
            T = poses[w_idx]  # [B,4,4]
            pts = (
                jnp.einsum("bij,bj->bi", T[:, :3, :3], local) + T[:, :3, 3]
            )
            st = map_state._replace(geo_feats=feats)
            q = nm.query_feature(
                st, pts, nb_offs, resolution, max_valid_dist2, knn_k,
                travel_dist, cur_ts, window, True, rotate_vecs=rotate_vecs,
                encode_vecs=encode_vecs,
            )
            pred = dec.sdf(
                mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16
            )
            # squared SDF at measured surface points (utils/mapper.py:927)
            return jnp.sum((pred**2) * sel) / jnp.clip(jnp.sum(sel), 1.0)

        grad_fn = jax.value_and_grad(loss_fn)

        def body(i, carry):
            params, adam, k, _ = carry
            k, kb = jax.random.split(k)
            loss, grads = grad_fn(params, kb)
            t = (i + 1).astype(jnp.float32)
            upd_d, a_d = _adam_update(
                grads[0], AdamState(adam.m[0], adam.v[0]), t, lr_pose, adam_eps
            )
            upd_f, a_f = _adam_update(
                grads[1], AdamState(adam.m[1], adam.v[1]), t, lr_map, adam_eps
            )
            params = (params[0] + upd_d, params[1] + upd_f)
            return (
                params,
                AdamState((a_d.m, a_f.m), (a_d.v, a_f.v)),
                k,
                loss,
            )

        deltas0 = jnp.zeros((window_size, 6), jnp.float32)
        params0 = (deltas0, map_state.geo_feats)
        adam0 = AdamState(
            (jnp.zeros_like(deltas0), jnp.zeros_like(map_state.geo_feats)),
            (jnp.zeros_like(deltas0), jnp.zeros_like(map_state.geo_feats)),
        )
        (deltas, feats), _, _, last_loss = jax.lax.fori_loop(
            0, iter_count, body, (params0, adam0, key, jnp.zeros(()))
        )
        new_poses = jnp.einsum(
            "wij,wjk->wik", poses0, lie.se3_exp(deltas)
        )
        new_state = map_state._replace(geo_feats=feats)
        return new_state, new_poses, last_loss

    return bundle_adjust
