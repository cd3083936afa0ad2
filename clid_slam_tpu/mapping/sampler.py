"""Training-sample generation along LiDAR rays.

Capabilities of the reference DataSampler (utils/data_sampler.py:260-402,
CLID mode): per measured ray, generate
  1 endpoint + n_surf Gaussian near-surface + n_front/n_behind uniform
  freespace samples,
then replace near-surface labels with region-specific estimates from the
raw-point local map (sign from the sampling displacement), masking out
surface samples that found no neighbors.

Static-shape design: rays arrive as (points[N,3] in the sensor/IMU frame,
mask[N]); output arrays have shape [N*S] where S = all_sample_n, in
*part-major* order (endpoint block, then surface blocks, then freespace
blocks — the reference's pre-transpose layout at utils/data_sampler.py:330);
invalidity is expressed in the returned mask instead of boolean compaction.

Sign/weight conventions preserved exactly:
- label = -displacement (in-front positive — utils/data_sampler.py:359)
- surface labels replaced by sign(disp<0 ? +1 : -1) * region_estimate (:354-367)
- dist-weighted surface samples in [1-0.5s, 1+0.5s] (:374-382)
- freespace weights negative as a type flag (:384)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.local_map import LocalMapState, region_specific_sdf
from ..utils.transforms import transform_points


class SampleBatch(NamedTuple):
    coords: jnp.ndarray  # [N*S, 3] sensor-frame sample coordinates
    sdf_label: jnp.ndarray  # [N*S]
    weight: jnp.ndarray  # [N*S] (sign = surface(+)/freespace(-))
    mask: jnp.ndarray  # [N*S] bool
    color: jnp.ndarray  # [N*S, C] (zeros for freespace; C=1 dummy if off)
    sem: jnp.ndarray  # [N*S] i32 (-1 unlabeled; 0 = freespace class)


def sample_rays(
    key: jax.Array,
    points: jnp.ndarray,  # [N,3] sensor-frame ray endpoints
    mask: jnp.ndarray,  # [N]
    pose: jnp.ndarray,  # [4,4] sensor->world
    local_map: LocalMapState,
    local_voxel_size,
    *,
    surface_sample_range_m: float,
    surface_sample_n: int,
    free_front_n: int,
    free_behind_n: int,
    free_sample_begin_ratio: float,
    free_sample_end_dist_m: float,
    max_range: float,
    dist_weight_on: bool = True,
    dist_weight_scale: float = 0.8,
    pin_mode: bool = False,
    behind_dropoff_on: bool = False,
    incidence_label_on: bool = False,
    incidence_min_factor: float = 0.1,
    incidence_degenerate_factor: float = 1.0,
    free_behind_weight: float = 1.0,
    colors=None,  # [N,C] per-ray color/intensity
    sem_labels=None,  # [N] i32 per-ray semantic label
) -> SampleBatch:
    n = points.shape[0]
    s_total = 1 + surface_sample_n + free_front_n + free_behind_n
    sigma = surface_sample_range_m
    k_surf, k_front, k_behind = jax.random.split(key, 3)

    dist = jnp.linalg.norm(points, axis=-1)  # [N]
    safe_dist = jnp.clip(dist, 1e-6)

    # Part 0: exact endpoint — ratio 1, displacement 0
    ratio0 = jnp.ones((1, n))
    disp0 = jnp.zeros((1, n))

    # Part 1: Gaussian near-surface
    disp_s = (
        jax.random.normal(k_surf, (surface_sample_n, n)) * sigma
    )  # [S_s, N]
    ratio_s = disp_s / safe_dist[None, :] + 1.0

    # Part 2: freespace in front, uniform ratio in [begin, 1 - 2σ/d]
    sigma_ratio = 2.0
    free_max_ratio_f = 1.0 - sigma_ratio * sigma / safe_dist[None, :]
    diff_f = free_max_ratio_f - free_sample_begin_ratio
    u_f = jax.random.uniform(k_front, (free_front_n, n))
    ratio_f = u_f * diff_f + free_sample_begin_ratio
    disp_f = (ratio_f - 1.0) * safe_dist[None, :]

    # Part 3: freespace behind, uniform ratio in [1 + 2σ/d, 1 + end/d]
    max_ratio_b = free_sample_end_dist_m / safe_dist[None, :] + 1.0
    min_ratio_b = 1.0 + sigma_ratio * sigma / safe_dist[None, :]
    u_b = jax.random.uniform(k_behind, (free_behind_n, n))
    ratio_b = u_b * (max_ratio_b - min_ratio_b) + min_ratio_b
    disp_b = (ratio_b - 1.0) * safe_dist[None, :]

    all_ratio = jnp.concatenate([ratio0, ratio_s, ratio_f, ratio_b], 0)  # [S,N]
    all_disp = jnp.concatenate([disp0, disp_s, disp_f, disp_b], 0)  # [S,N]

    coords = points[None, :, :] * all_ratio[:, :, None]  # [S,N,3]
    sdf_label = -all_disp  # in-front positive (projective distance)

    surf_lo, surf_hi = 1, 1 + surface_sample_n
    if not pin_mode:
        # CLID mode: region-specific estimation for the surface blocks
        # (not the endpoint) — utils/data_sampler.py:352-367
        surf_coords = coords[surf_lo:surf_hi].reshape(-1, 3)  # [S_s*N, 3]
        surf_global = transform_points(surf_coords, pose)
        est_dist, est_valid, est_normal, est_fit = region_specific_sdf(
            local_map, surf_global, local_voxel_size, with_normal=True
        )
        sdf_sign = jnp.where(disp_s.reshape(-1) < 0, 1.0, -1.0)
        surf_label = sdf_sign * est_dist
        sdf_label = sdf_label.at[surf_lo:surf_hi].set(
            surf_label.reshape(surface_sample_n, n)
        )
        if incidence_label_on:
            # Incidence-corrected FREESPACE labels (r5, beyond the
            # reference): a free sample displaced s along a ray hitting a
            # surface at grazing incidence sits only ~s·sinθ from that
            # surface, yet the projective label says s (the full along-ray
            # distance). Supervising sigmoid(s/σ) at a point s·sinθ from
            # the plane drags the learned zero-level set toward the
            # sensor — measured on the 200-frame hall bench as a coherent
            # ~3.5 mm/frame z ratchet against the grazing-viewed floor
            # (scripts/diag_large10.py error decomposition). The region
            # plane fit already yields the surface normal, so scale the
            # freespace labels by sinθ = |d̂·n̂| — the same "region
            # specific" philosophy the CLID labels apply to surface
            # samples (model/local_point_cloud_map.py:98-152), extended
            # to the free samples the reference leaves projective
            # (utils/data_sampler.py:345-359). The factor floor keeps
            # multi-meter free labels saturated (min_f·s >> 3σ) so only
            # the near-surface regime changes.
            # per-ray normal: the FIRST successful fit among the ray's
            # surface samples (all within ~sigma of the endpoint, so any
            # of their planes is the endpoint's local surface)
            nrm = est_normal.reshape(surface_sample_n, n, 3)
            fit = est_fit.reshape(surface_sample_n, n)  # [S_s, n]
            sup = est_valid.reshape(surface_sample_n, n)
            first = jnp.argmax(fit, axis=0)  # [n] first True (0 if none)
            onehot = first[None, :] == jnp.arange(surface_sample_n)[:, None]
            n_best = jnp.sum(nrm * onehot[..., None], axis=0)  # [n,3]
            fit_any = jnp.any(fit, axis=0)
            sup_any = jnp.any(sup, axis=0)
            d_world = points @ pose[:3, :3].T  # ray dirs, world frame
            d_hat = d_world / jnp.clip(
                jnp.linalg.norm(d_world, axis=-1, keepdims=True), 1e-9
            )
            sin_inc = jnp.abs(jnp.sum(d_hat * n_best, axis=-1))  # [n]
            # three regimes (measured, scripts/diag_large11.py):
            # - a fit succeeded: scale by sin(incidence);
            # - support exists but NO plane fits: degenerate (near-1-D)
            #   ring support — strongly correlated with grazing incidence
            #   (on-surface ring spacing ~ beam_spacing·r/sinθ), scaled by
            #   ``incidence_degenerate_factor`` (1.0 = keep projective);
            # - no local-map support at all (new territory): keep the
            #   projective label — the PIN-style bootstrap carve.
            factor = jnp.where(
                fit_any,
                jnp.clip(sin_inc, incidence_min_factor, 1.0),
                jnp.where(sup_any, incidence_degenerate_factor, 1.0),
            )
            sdf_label = sdf_label.at[surf_hi:].multiply(factor[None, :])
    else:
        # PIN mode keeps the projective-distance labels as-is
        # (utils/data_sampler.py:16-258)
        est_valid = None

    # weights
    weight = jnp.ones((s_total, n))
    if dist_weight_on:
        w_surface = (
            1.0
            + dist_weight_scale * 0.5
            - (dist / max_range) * dist_weight_scale
        )  # [0.6, 1.4]
        weight = weight.at[:surf_hi].set(
            jnp.broadcast_to(w_surface[None, :], (surf_hi, n))
        )
    if behind_dropoff_on:
        # utils/data_sampler.py:154-163: weight falls off behind surface
        dropoff_min = 0.2 * free_sample_end_dist_m
        dropoff_max = free_sample_end_dist_m
        dw = (dropoff_max - all_disp) / (dropoff_max - dropoff_min)
        dw = jnp.clip(dw, 0.0, 1.0) * 0.8 + 0.2
        weight = weight * dw
    weight = weight.at[surf_hi:].multiply(-1.0)
    if free_behind_weight != 1.0:
        # free-sample mass balance (r5): with incidence-corrected
        # labels the 2-front/1-behind sampling leaves ~2x more BCE
        # mass just above a grazing surface than below; the smoothed
        # field's zero crossing shifts toward the heavier side
        # (measured floor-low bias, scripts/diag_large12.py). Scaling
        # the behind block equalizes the near-surface mass.
        weight = weight.at[surf_hi + free_front_n:].multiply(
            free_behind_weight
        )

    # validity: ray mask everywhere; surface samples also need neighbors
    valid = jnp.broadcast_to(mask[None, :], (s_total, n))
    if est_valid is not None:
        valid = valid.at[surf_lo:surf_hi].set(
            valid[surf_lo:surf_hi] & est_valid.reshape(surface_sample_n, n)
        )

    # color labels: endpoint + near-surface samples carry the ray color,
    # freespace samples zero (utils/data_sampler.py:61-107, 196-206)
    if colors is not None:
        c = colors.shape[1]
        color_s = jnp.zeros((s_total, n, c))
        color_s = color_s.at[:surf_hi].set(
            jnp.broadcast_to(colors[None, :, :], (surf_hi, n, c))
        )
    else:
        color_s = jnp.zeros((s_total, n, 1))
    # semantic labels: surface samples keep the ray label, freespace gets
    # class 0 (utils/data_sampler.py:184-193)
    if sem_labels is not None:
        sem_s = jnp.zeros((s_total, n), jnp.int32)
        sem_s = sem_s.at[:surf_hi].set(
            jnp.broadcast_to(sem_labels[None, :], (surf_hi, n))
        )
    else:
        sem_s = jnp.full((s_total, n), -1, jnp.int32)

    return SampleBatch(
        coords=coords.reshape(-1, 3),
        sdf_label=sdf_label.reshape(-1),
        weight=weight.reshape(-1),
        mask=valid.reshape(-1),
        color=color_s.reshape(s_total * n, -1),
        sem=sem_s.reshape(-1),
    )
