"""Map-based dynamic-object filtering.

Equivalent of Mapper.dynamic_filter (utils/mapper.py:99-136, strategy 1 +
optional strategy 2): a measurement is dynamic when it lands in confidently
observed free space — map certainty above a threshold while the predicted
SDF is well positive (in front of any surface). Optionally also gate on
unstable SDF gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import decoder as dec
from ..models import neural_map as nm


def make_dynamic_filter_fn(
    *,
    knn_k: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    certainty_thre: float,
    sdf_ratio_thre: float,
    min_grad_norm: float = 0.1,
    type_2_on: bool = True,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
):
    @jax.jit
    def static_mask(
        map_state: nm.NeuralMapState,
        mlp,
        points_world,  # [N,3]
        mask,  # [N]
        travel_dist,
        cur_ts,
        window,
    ):
        def sdf_sum(pts):
            q = nm.query_feature(
                map_state, pts, nb_offs, resolution, max_valid_dist2, knn_k,
                travel_dist, cur_ts, window, True, rotate_vecs=rotate_vecs,
                encode_vecs=encode_vecs,
            )
            pred = dec.sdf(
                mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16
            )
            return jnp.sum(pred), (pred, q.certainty)

        if type_2_on:
            grad, (pred, certainty) = jax.grad(sdf_sum, has_aux=True)(
                points_world
            )
            grad_norm = jnp.sqrt(jnp.sum(grad * grad, axis=-1) + 1e-20)
        else:
            _, (pred, certainty) = sdf_sum(points_world)

        # strategy 1 (utils/mapper.py:122-126): certain freespace -> dynamic
        static = (certainty < certainty_thre) | (
            pred < sdf_ratio_thre * resolution
        )
        if type_2_on:
            # strategy 2 (:129-134): unstable gradient in certain space
            static = static & (
                (grad_norm > min_grad_norm) | (certainty < certainty_thre)
            )
        return static & mask

    return static_mask
