"""Batched least-squares plane fitting via closed-form 3x3 symmetric eigen.

The reference fits planes to 4-point kNN neighborhoods with a batched SVD
(model/local_point_cloud_map.py:155-201). A general SVD is a poor fit for
the TPU (iterative, tiny matrices); the same quantities come from the 3x3
scatter matrix AᵀA of the centered points, whose eigendecomposition has a
closed trigonometric form — pure VPU math, fully vectorized.

Validity tests mirror the reference exactly:
- eta = λ_min / (λ_mid + 1e-6) <= eta_threshold, on *singular values*
  λ_i = sqrt(eig_i of AᵀA)   (model/local_point_cloud_map.py:172-178)
- max point-to-plane residual <= threshold  (:195-198)
"""

from __future__ import annotations

import jax.numpy as jnp


def sym3x3_eigvals(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [...,3,3], descending. Closed-form
    (trigonometric method for symmetric 3x3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    p1 = a01**2 + a02**2 + a12**2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.clip(p2 / 6.0, 1e-30))
    Bm = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / p[..., None, None]
    detB = (
        Bm[..., 0, 0] * (Bm[..., 1, 1] * Bm[..., 2, 2] - Bm[..., 1, 2] * Bm[..., 2, 1])
        - Bm[..., 0, 1] * (Bm[..., 1, 0] * Bm[..., 2, 2] - Bm[..., 1, 2] * Bm[..., 2, 0])
        + Bm[..., 0, 2] * (Bm[..., 1, 0] * Bm[..., 2, 1] - Bm[..., 1, 1] * Bm[..., 2, 0])
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # nearly-isotropic case: all eigenvalues -> q
    iso = p2 < 1e-20
    e1 = jnp.where(iso, q, e1)
    e2 = jnp.where(iso, q, e2)
    e3 = jnp.where(iso, q, e3)
    return jnp.stack([e1, e2, e3], axis=-1)


def sym3x3_min_eigvec(A: jnp.ndarray, eigvals: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric [...,3,3].

    Uses the classic (A-λ1 I)(A-λ2 I) column trick: for distinct
    eigenvalues every nonzero column of that product is parallel to the
    λ3-eigenvector; pick the largest-norm column for stability.
    """
    I = jnp.eye(3, dtype=A.dtype)
    M = (A - eigvals[..., 0, None, None] * I) @ (
        A - eigvals[..., 1, None, None] * I
    )
    norms = jnp.linalg.norm(M, axis=-2)  # [...,3] column norms
    best = jnp.argmax(norms, axis=-1)
    # one-hot column select: take_along_axis on the minor dim is the slow
    # per-element gather path on TPU (r3 trace, 5.5 ms/frame here)
    onehot = best[..., None] == jnp.arange(3)
    v = jnp.sum(M * onehot[..., None, :], axis=-1)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate: fall back to +z (callers gate with the eta test anyway)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v.shape)
    return jnp.where(n > 1e-12, v / jnp.clip(n, 1e-12), fallback)


def fit_plane_knn(
    knn_points: jnp.ndarray,  # [..., K, 3]
    eta_threshold: float = 0.2,
    residual_threshold: float = 0.1,
):
    """Fit a plane per neighborhood; validity per the reference
    (model/local_point_cloud_map.py:155-201).

    Returns (normal [...,3], plane_constant [...], fit_success [...]).
    Invalid fits return a zero normal (matching the reference, which zeroes
    normals failing the eta test before computing distances).
    """
    centroid = jnp.mean(knn_points, axis=-2, keepdims=True)
    centered = knn_points - centroid
    scatter = jnp.einsum("...ki,...kj->...ij", centered, centered)
    eig = sym3x3_eigvals(scatter)  # descending
    svals = jnp.sqrt(jnp.clip(eig, 0.0))
    eta = svals[..., 2] / (svals[..., 1] + 1e-6)
    eta_ok = eta <= eta_threshold

    normal = sym3x3_min_eigvec(scatter, eig)
    normal = jnp.where(eta_ok[..., None], normal, 0.0)
    constant = -jnp.sum(normal * centroid[..., 0, :], axis=-1)

    dists = jnp.abs(
        jnp.einsum("...ki,...i->...k", knn_points, normal) + constant[..., None]
    )
    resid_ok = jnp.max(dists, axis=-1) <= residual_threshold
    return normal, constant, eta_ok & resid_ok


def fit_plane_masked(
    points: jnp.ndarray,  # [..., C, 3] candidate neighbors
    sel: jnp.ndarray,  # [..., C] bool — which candidates participate
    eta_threshold: float = 0.2,
    residual_threshold: float = 0.1,
):
    """``fit_plane_knn`` without the neighbor gather: the K selected points
    are given as a mask over C candidates (identical math — centroid,
    scatter matrix, eta and residual gates run on mask-weighted sums).
    Callers must ensure ``sel`` selects the intended number of points;
    degenerate selections fail the eta gate as in the gathered version."""
    m = sel.astype(points.dtype)[..., None]  # [...,C,1]
    cnt = jnp.clip(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    centroid = jnp.sum(points * m, axis=-2, keepdims=True) / cnt
    centered = (points - centroid) * m
    scatter = jnp.einsum("...ki,...kj->...ij", centered, centered)
    eig = sym3x3_eigvals(scatter)
    svals = jnp.sqrt(jnp.clip(eig, 0.0))
    eta = svals[..., 2] / (svals[..., 1] + 1e-6)
    eta_ok = eta <= eta_threshold

    normal = sym3x3_min_eigvec(scatter, eig)
    normal = jnp.where(eta_ok[..., None], normal, 0.0)
    constant = -jnp.sum(normal * centroid[..., 0, :], axis=-1)

    dists = jnp.abs(
        jnp.einsum("...ki,...i->...k", points, normal) + constant[..., None]
    )
    dists = jnp.where(sel, dists, 0.0)  # excluded candidates can't veto
    resid_ok = jnp.max(dists, axis=-1) <= residual_threshold
    return normal, constant, eta_ok & resid_ok
