"""Shared SDF decoder MLP, as a plain pytree of params + pure functions.

Capabilities of the reference Decoder (model/decoder.py:12-111): a small MLP
(hidden_level x hidden_dim, ReLU) over the interpolated neural-point feature
concatenated with the relative position vector, with heads for sdf /
occupancy / semantic log-prob / color. The sdf head scales its output by
``logistic_gaussian_ratio * sigma_sigmoid_m`` when training with BCE
(model/decoder.py:51-53).

TPU notes: the matmuls are tiny per-row (e.g. 11 -> 64 -> 1) but batched over
10k-1M query points, so they tile cleanly onto the MXU; optional bfloat16
compute keeps f32 params with bf16 activations.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp


class MLPParams(NamedTuple):
    weights: List[jnp.ndarray]  # hidden layer weights [in,out]
    biases: List[jnp.ndarray]
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def init_mlp(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    hidden_level: int,
    out_dim: int = 1,
    bias_on: bool = True,
) -> MLPParams:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) init (torch Linear default,
    what the reference decoder trains from)."""
    weights, biases = [], []
    dim = input_dim
    for _ in range(hidden_level):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(dim)
        weights.append(
            jax.random.uniform(k1, (dim, hidden_dim), jnp.float32, -bound, bound)
        )
        biases.append(
            jax.random.uniform(k2, (hidden_dim,), jnp.float32, -bound, bound)
            if bias_on
            else jnp.zeros((hidden_dim,), jnp.float32)
        )
        dim = hidden_dim
    key, k1, k2 = jax.random.split(key, 3)
    bound = 1.0 / jnp.sqrt(dim)
    w_out = jax.random.uniform(k1, (dim, out_dim), jnp.float32, -bound, bound)
    b_out = (
        jax.random.uniform(k2, (out_dim,), jnp.float32, -bound, bound)
        if bias_on
        else jnp.zeros((out_dim,), jnp.float32)
    )
    return MLPParams(weights, biases, w_out, b_out)


def mlp_forward(
    params: MLPParams,
    x: jnp.ndarray,
    leaky: bool = False,
    bf16: bool = False,
) -> jnp.ndarray:
    """[..., D] -> [..., out_dim]."""
    # full f32 accumulation: TPU truncates "f32" matmuls to bf16 passes by
    # default, which is enough to push SDF gradients across the tracker's
    # grad-norm validity gates — force highest unless bf16 mode is explicit
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    h = x
    if bf16:
        h = h.astype(jnp.bfloat16)
    for w, b in zip(params.weights, params.biases):
        if bf16:
            w = w.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32, precision=prec) + b
        h = jax.nn.leaky_relu(h) if leaky else jax.nn.relu(h)
        if bf16:
            h = h.astype(jnp.bfloat16)
    w_out, b_out = params.w_out, params.b_out
    if bf16:
        w_out = w_out.astype(jnp.bfloat16)
    out = (
        jnp.dot(h, w_out, preferred_element_type=jnp.float32, precision=prec)
        + b_out
    )
    return out.astype(jnp.float32)


def sdf(params: MLPParams, feature: jnp.ndarray, sdf_scale, **kw) -> jnp.ndarray:
    """Scaled SDF prediction (model/decoder.py:80-82): [..., D] -> [...]."""
    return mlp_forward(params, feature, **kw)[..., 0] * sdf_scale


def occupancy(params: MLPParams, feature: jnp.ndarray, sdf_scale, **kw):
    """model/decoder.py:91-94."""
    return jax.nn.sigmoid(sdf(params, feature, sdf_scale, **kw) / -sdf_scale)


def sem_label_prob(params: MLPParams, feature: jnp.ndarray, **kw):
    """model/decoder.py:97-99."""
    return jax.nn.log_softmax(mlp_forward(params, feature, **kw), axis=-1)


def regress_color(params: MLPParams, feature: jnp.ndarray, **kw):
    """model/decoder.py:109-111."""
    return jax.nn.sigmoid(mlp_forward(params, feature, **kw))
