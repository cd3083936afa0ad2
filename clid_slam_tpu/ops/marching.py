"""Isosurface extraction on device: vectorized marching tetrahedra.

Replaces the reference's skimage.measure.marching_cubes call
(utils/mesher.py:371-399, Cython, host-only) with a JAX marching-tetrahedra
formulation that runs on TPU: every cube splits into 6 tetrahedra sharing
the main diagonal; each tetrahedron emits 0-2 triangles from a 16-case
analysis expressed as a tiny static table. Output is a fixed-capacity
triangle buffer + validity mask (variable counts are compacted on host),
the standard static-shape trick for TPU.

Vertex placement is the usual linear interpolation along sign-crossing
edges, so vertices lie on the same zero crossing skimage would find; the
tessellation differs (more, smaller triangles) but the surface is the same.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# cube corner offsets, index bit k = axis k
_CORNERS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int32
)

# 6-tetrahedra decomposition sharing diagonal 0-7
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int32,
)

# tetrahedron edges
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# case -> up to 2 triangles, each a triple of edge ids (-1 = unused).
# cases 8..14 mirror 7..1 with reversed winding.
_CASE_TRIS = np.full((16, 2, 3), -1, np.int32)
_CASE_TRIS[1, 0] = [0, 1, 2]
_CASE_TRIS[2, 0] = [0, 4, 3]
_CASE_TRIS[3] = [[1, 3, 4], [1, 4, 2]]
_CASE_TRIS[4, 0] = [1, 5, 3]
_CASE_TRIS[5] = [[0, 3, 5], [0, 5, 2]]
_CASE_TRIS[6] = [[0, 4, 5], [0, 5, 1]]
_CASE_TRIS[7, 0] = [2, 4, 5]
for _m in range(8, 15):
    _comp = _CASE_TRIS[15 - _m]
    _CASE_TRIS[_m] = _comp[:, ::-1]  # reverse winding


@partial(jax.jit, static_argnames=("dims",))
def marching_tetrahedra(
    sdf_grid: jnp.ndarray,  # [X*Y*Z] flattened, x-major: idx = (x*Y + y)*Z + z
    mask_grid: jnp.ndarray,  # [X*Y*Z] bool — corner valid for meshing
    origin: jnp.ndarray,  # [3] world coords of grid point (0,0,0)
    resolution,
    dims: tuple,  # (X, Y, Z) static
):
    """Returns (tri_verts [M,3,3] f32 world coords, tri_valid [M] bool) with
    M = (X-1)(Y-1)(Z-1)*6*2."""
    X, Y, Z = dims
    cx, cy, cz = X - 1, Y - 1, Z - 1
    n_cells = cx * cy * cz

    cell = jnp.arange(n_cells, dtype=jnp.int32)
    x = cell // (cy * cz)
    y = (cell // cz) % cy
    z = cell % cz
    base = jnp.stack([x, y, z], -1)  # [C,3]

    corners = base[:, None, :] + jnp.asarray(_CORNERS)[None, :, :]  # [C,8,3]
    flat = (corners[..., 0] * Y + corners[..., 1]) * Z + corners[..., 2]
    f = sdf_grid[flat]  # [C,8]
    m = mask_grid[flat]  # [C,8]
    cell_ok = jnp.all(m, axis=-1)  # mc_mask semantics: all corners valid

    tets = jnp.asarray(_TETS)  # [6,4]
    tf = f[:, tets]  # [C,6,4]
    tcorn = corners[:, tets, :]  # [C,6,4,3]

    inside = (tf < 0.0).astype(jnp.int32)  # iso level 0
    case = (
        inside[..., 0]
        + inside[..., 1] * 2
        + inside[..., 2] * 4
        + inside[..., 3] * 8
    )  # [C,6]

    # interpolated vertex for each of the 6 tet edges
    te = jnp.asarray(_TET_EDGES)  # [6,2]
    fa = tf[..., te[:, 0]]  # [C,6,6]
    fb = tf[..., te[:, 1]]
    pa = tcorn[:, :, te[:, 0], :].astype(jnp.float32)  # [C,6,6,3]
    pb = tcorn[:, :, te[:, 1], :].astype(jnp.float32)
    denom = fa - fb
    t = fa / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    everts = pa + t[..., None] * (pb - pa)  # [C,6,6,3] grid coords

    case_tris = jnp.asarray(_CASE_TRIS)  # [16,2,3]
    tri_edges = case_tris[case]  # [C,6,2,3]
    tri_ok = tri_edges[..., 0] >= 0  # [C,6,2]
    safe_edges = jnp.clip(tri_edges, 0)
    # gather triangle vertices: [C,6,2,3tri_vert,3coords]
    tri = jnp.take_along_axis(
        everts[:, :, None, :, :],  # [C,6,1,6,3]
        safe_edges[..., None].repeat(3, -1),  # [C,6,2,3,3]
        axis=3,
    )
    tri_ok = tri_ok & cell_ok[:, None, None]

    world = origin[None, None, None, None, :] + tri * resolution
    return world.reshape(-1, 3, 3), tri_ok.reshape(-1)
