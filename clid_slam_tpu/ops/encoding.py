"""Positional encodings for the relative-position suffix of map queries.

Capability parity with the reference's encoders
(model/neural_points.py:1095-1160): a log-spaced sinusoidal encoder
(`PositionalEncoder`) and Gaussian Fourier features
(`GaussianFourierFeatures`, borrowed there from LocNDF). Both are applied to
the per-neighbor relative vector *before* IDW weighting
(model/neural_points.py:676-677); with ``pos_encoding_band = 0`` (every
shipped reference config) encoding is off and queries carry the raw 3-vector.

TPU notes: the scales / projection matrix are static numpy constants baked
into the jitted program as HLO literals; the encode itself is a handful of
VPU transcendentals fused into the query.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def positional_scales(
    num_bands: int, freq: float, base: float
) -> np.ndarray:
    """Log-spaced scales: logspace(0, log_base(freq/2), bands, base)."""
    stop = np.log(freq / 2) / np.log(base)
    return np.logspace(0.0, stop, num_bands, base=base).astype(np.float32)


def positional_encode(
    x: jnp.ndarray, scales: np.ndarray, input_dim: int = 3
) -> jnp.ndarray:
    """[..., D] -> [..., D*(2*bands+1)]: per-dim (sin, cos over bands, x).

    Matches model/neural_points.py:1109-1133: x[..., d] is scaled by each
    band's scale times pi, sin/cos taken, original value appended, then the
    (dim, 2*bands+1) block is flattened."""
    x = x[..., :input_dim, None]  # [..., D, 1]
    xs = x * scales * jnp.pi  # [..., D, B]
    enc = jnp.concatenate([jnp.sin(xs), jnp.cos(xs), x], axis=-1)
    return enc.reshape(*enc.shape[:-2], -1)


def gaussian_fourier_matrix(
    num_bands: int, freq: float, input_dim: int = 3, seed: int = 42
) -> np.ndarray:
    """Fixed random projection B ~ N(0, freq²), [D, bands]
    (model/neural_points.py:1152-1154)."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((input_dim, num_bands)) * freq).astype(
        np.float32
    )


def gaussian_fourier_encode(x: jnp.ndarray, B: np.ndarray) -> jnp.ndarray:
    """[..., D] -> [..., D + 2*bands] (model/neural_points.py:1157-1159)."""
    proj = (2.0 * jnp.pi * x) @ B
    return jnp.concatenate([x, jnp.sin(proj), jnp.cos(proj)], axis=-1)


def make_encoder(
    *,
    num_bands: int,
    freq: float,
    base: float,
    use_gaussian: bool,
    input_dim: int = 3,
    seed: int = 42,
) -> Tuple[Optional[Callable[[jnp.ndarray], jnp.ndarray]], int]:
    """(encode_fn | None, encoded_dim). ``num_bands == 0`` disables encoding
    (reference utils/config.py:188) and returns (None, input_dim)."""
    if num_bands <= 0:
        return None, input_dim
    if use_gaussian:
        B = gaussian_fourier_matrix(num_bands, freq, input_dim, seed)
        return (lambda x: gaussian_fourier_encode(x, B)), input_dim + 2 * num_bands
    scales = positional_scales(num_bands, freq, base)
    return (
        lambda x: positional_encode(x, scales, input_dim)
    ), input_dim * (2 * num_bands + 1)
