"""Mesh reconstruction from the neural SDF map.

Capabilities of the reference Mesher (utils/mesher.py:38-667): batched SDF
queries over dense grids with a min-neighbor validity mask, chunked
reconstruction over AABBs, marching-cubes surface extraction, SDF slice
visualization clouds, and isolated-cluster filtering.

TPU-native design:
- grid chunks have ONE static shape (compile once); partial chunks at the
  volume boundary are padded and masked instead of shrunk;
- isosurface extraction is the on-device marching-tetrahedra kernel
  (ops/marching.py) — no host Cython roundtrip; only the valid triangles
  come back to host;
- vertex dedup + isolated-cluster filtering are cheap host numpy passes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import decoder as dec
from .models import neural_map as nm
from .ops.marching import marching_tetrahedra


class Mesher:
    def __init__(
        self,
        *,
        knn_k: int,
        nb_offs,
        resolution: float,
        max_valid_dist2: float,
        sdf_scale: float,
        mesh_min_nn: int = 8,
        chunk_dim: int = 48,
        mlp_leaky: bool = False,
        mlp_bf16: bool = False,
        feature_dim: int = 8,
        rotate_vecs: bool = False,
        encode_vecs=None,
        weighted_first: bool = True,
        layer_norm: bool = False,
    ):
        self.chunk_dim = int(chunk_dim)
        self.mesh_min_nn = mesh_min_nn
        cd = self.chunk_dim

        def _query(map_state, pts):
            return nm.query_feature(
                map_state, pts, nb_offs, resolution, max_valid_dist2, knn_k,
                rotate_vecs=rotate_vecs,
                encode_vecs=encode_vecs,
                weighted_first=weighted_first,
                layer_norm=layer_norm,
            )

        @jax.jit
        def query_chunk(map_state, mlp, pts, valid_in):
            q = _query(map_state, pts)
            sdf = dec.sdf(mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16)
            if not weighted_first:  # decode-then-weight (utils/mesher.py:130-147)
                sdf = jnp.sum(sdf * q.weights, axis=1)
            ok = valid_in & (q.nn_count >= mesh_min_nn)
            return sdf, ok

        @jax.jit
        def color_chunk(map_state, color_mlp, pts, valid_in):
            """Vertex color regression (utils/mesher.py:425-443 semantics):
            same kNN query, color-feature slab, sigmoid color head."""
            q = _query(map_state, pts)
            cfeat = nm.query_color_feature(map_state, q, feature_dim)
            color = dec.regress_color(
                color_mlp, cfeat, leaky=mlp_leaky, bf16=mlp_bf16
            )
            if not weighted_first:
                color = jnp.sum(color * q.weights[..., None], axis=1)
            ok = valid_in & (q.nn_count >= mesh_min_nn)
            return color, ok

        @jax.jit
        def sem_chunk(map_state, sem_mlp, pts, valid_in):
            """Vertex semantic argmax (utils/mesher.py:401-423 semantics)."""
            q = _query(map_state, pts)
            logp = dec.sem_label_prob(
                sem_mlp, q.feature, leaky=mlp_leaky, bf16=mlp_bf16
            )
            if not weighted_first:
                logp = jnp.sum(logp * q.weights[..., None], axis=1)
            labels = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            ok = valid_in & (q.nn_count >= mesh_min_nn)
            return labels, ok

        @partial(jax.jit, static_argnames=())
        def mesh_chunk(map_state, mlp, origin, mc_res, valid_in):
            # grid points of one chunk: [cd^3, 3]
            r = jnp.arange(cd, dtype=jnp.float32)
            gx, gy, gz = jnp.meshgrid(r, r, r, indexing="ij")
            grid = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            pts = origin[None, :] + grid * mc_res
            sdf, ok = query_chunk(map_state, mlp, pts, valid_in)
            # marching_tetrahedra emits world = origin + grid_coord * res
            tris, tri_ok = marching_tetrahedra(
                sdf, ok, origin, mc_res, (cd, cd, cd)
            )
            return tris, tri_ok

        self._query_chunk = query_chunk
        self._color_chunk = color_chunk
        self._sem_chunk = sem_chunk
        self._mesh_chunk = mesh_chunk

    # ------------------------------------------------------------- meshing
    def recon_aabb_mesh(
        self,
        map_state,
        mlp,
        aabb_min: np.ndarray,
        aabb_max: np.ndarray,
        mc_res: float,
        pad_voxel: int = 2,
        min_cluster_vertices: int = 0,
        guide_points: Optional[np.ndarray] = None,
        skip_top_voxel: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Chunked reconstruction over an AABB
        (utils/mesher.py:523-667 semantics). Returns (vertices [V,3],
        triangles [T,3]) as numpy arrays.

        ``guide_points`` (usually the live neural-point positions) restricts
        the sweep to occupied chunks, like the reference's point-guided
        chunk split (utils/tools.py:727-799) — on a long corridor map this
        skips the overwhelmingly empty volume. ``skip_top_voxel`` trims the
        top of the z range (utils/mesher.py:178-181)."""
        cd = self.chunk_dim
        aabb_min = np.asarray(aabb_min, np.float64) - pad_voxel * mc_res
        aabb_max = np.asarray(aabb_max, np.float64) + pad_voxel * mc_res
        aabb_max[2] -= skip_top_voxel * mc_res
        span = np.maximum(aabb_max - aabb_min, mc_res)
        # chunks overlap by one grid point so cells at borders are covered
        step = (cd - 1) * mc_res
        nx, ny, nz = [max(1, int(np.ceil(s / step))) for s in span]

        if guide_points is not None and len(guide_points):
            occupied = set()
            pad = pad_voxel * mc_res
            for d in np.array(
                [[-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1],
                 [1, -1, -1], [1, -1, 1], [1, 1, -1], [1, 1, 1]],
                np.float64,
            ):
                # dilate by the pad margin so near-boundary surface cells
                # are still covered
                g = np.floor(
                    (guide_points + d * pad - aabb_min) / step
                ).astype(np.int64)
                np.clip(g, 0, [nx - 1, ny - 1, nz - 1], out=g)
                occupied.update(map(tuple, np.unique(g, axis=0)))
            chunk_ids = sorted(occupied)
        else:
            chunk_ids = [
                (ix, iy, iz)
                for ix in range(nx)
                for iy in range(ny)
                for iz in range(nz)
            ]

        all_tris = []
        valid_in = jnp.ones((cd**3,), bool)
        for cid in chunk_ids:
            origin = aabb_min + np.asarray(cid, np.float64) * step
            tris, ok = self._mesh_chunk(
                map_state,
                mlp,
                jnp.asarray(origin, jnp.float32),
                mc_res,
                valid_in,
            )
            ok_np = np.asarray(ok)
            if ok_np.any():
                tri_np = np.asarray(tris)[ok_np]
                if skip_top_voxel > 0:
                    tri_np = tri_np[
                        (tri_np[..., 2] <= aabb_max[2]).all(axis=-1)
                    ]
                if len(tri_np):
                    all_tris.append(tri_np)
        if not all_tris:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        tri_soup = np.concatenate(all_tris, 0)  # [T,3,3]
        return _weld_mesh(tri_soup, mc_res, min_cluster_vertices)

    # ------------------------------------------------- vertex attributes
    def _query_attr(self, chunk_fn, map_state, mlp, pts, fill):
        """Run a jitted per-chunk attribute query over arbitrary points in
        fixed-size padded batches."""
        cd3 = self.chunk_dim**3
        n = len(pts)
        if n == 0:
            return (
                np.zeros((0,) + np.shape(fill), np.asarray(fill).dtype),
                np.zeros(0, bool),
            )
        n_pad = ((n + cd3 - 1) // cd3) * cd3
        buf = np.zeros((n_pad, 3), np.float32)
        buf[:n] = pts
        outs, oks = [], []
        for i in range(0, n_pad, cd3):
            valid = jnp.asarray(np.arange(i, i + cd3) < n)
            o, ok = chunk_fn(map_state, mlp, jnp.asarray(buf[i : i + cd3]), valid)
            outs.append(np.asarray(o))
            oks.append(np.asarray(ok))
        return np.concatenate(outs)[:n], np.concatenate(oks)[:n]

    def estimate_vertex_colors(
        self, map_state, color_mlp, verts: np.ndarray, color_channel: int = 3
    ) -> np.ndarray:
        """Per-vertex color in [0,1] (utils/mesher.py:425-443). Intensity
        maps (color_channel=1) are doubled and replicated to gray like the
        reference."""
        color, ok = self._query_attr(
            self._color_chunk, map_state, color_mlp, verts, np.zeros(3)
        )
        if color_channel == 1:
            color = np.repeat(np.clip(color[:, :1] * 2.0, 0, 1), 3, axis=1)
        else:
            color = np.clip(color[:, :3], 0, 1)
        color[~ok] = 0.5
        return color

    def estimate_vertex_sem(
        self, map_state, sem_mlp, verts: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-vertex semantic labels + keep-mask; label 0 = free space is
        filtered like the reference (utils/mesher.py:418-421)."""
        labels, ok = self._query_attr(
            self._sem_chunk, map_state, sem_mlp, verts, np.int32(0)
        )
        keep = ok & (labels > 0)
        return labels, keep

    # ------------------------------------------------------------ SDF grid
    def query_sdf_points(
        self, map_state, mlp, pts: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Query arbitrary points in fixed-size padded batches; returns
        (sdf [N], valid [N])."""
        cd3 = self.chunk_dim**3
        n = len(pts)
        n_pad = ((n + cd3 - 1) // cd3) * cd3
        buf = np.zeros((n_pad, 3), np.float32)
        buf[:n] = pts
        sdf_out = np.zeros(n_pad, np.float32)
        ok_out = np.zeros(n_pad, bool)
        for i in range(0, n_pad, cd3):
            valid = jnp.asarray(np.arange(i, i + cd3) < n)
            s, ok = self._query_chunk(
                map_state, mlp, jnp.asarray(buf[i : i + cd3]), valid
            )
            sdf_out[i : i + cd3] = np.asarray(s)
            ok_out[i : i + cd3] = np.asarray(ok)
        return sdf_out[:n], ok_out[:n]

    def sdf_slice(
        self,
        map_state,
        mlp,
        center: np.ndarray,
        extent: float,
        height: float,
        res: float,
    ):
        """Horizontal SDF slice visualization points
        (utils/mesher.py:281-334, 460-521). Returns (points [N,3],
        sdf [N], valid [N])."""
        xs = np.arange(center[0] - extent, center[0] + extent, res)
        ys = np.arange(center[1] - extent, center[1] + extent, res)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        pts = np.stack(
            [gx.ravel(), gy.ravel(), np.full(gx.size, height)], -1
        ).astype(np.float32)
        sdf, ok = self.query_sdf_points(map_state, mlp, pts)
        return pts, sdf, ok

    def sdf_slice_vertical(
        self,
        map_state,
        mlp,
        center: np.ndarray,
        extent: float,
        slice_x: float,
        res: float,
        z_lo: float = None,
        z_hi: float = None,
    ):
        """Vertical SDF slice at world x = slice_x (the reference's
        get_query_from_ver_slice, utils/mesher.py:246-279: a y-z grid
        with the x dimension collapsed to the slice plane). Returns
        (points [N,3], sdf [N], valid [N])."""
        ys = np.arange(center[1] - extent, center[1] + extent, res)
        if z_lo is None:
            z_lo = center[2] - extent
        if z_hi is None:
            z_hi = center[2] + extent
        zs = np.arange(z_lo, z_hi, res)
        gy, gz = np.meshgrid(ys, zs, indexing="ij")
        pts = np.stack(
            [np.full(gy.size, slice_x), gy.ravel(), gz.ravel()], -1
        ).astype(np.float32)
        sdf, ok = self.query_sdf_points(map_state, mlp, pts)
        return pts, sdf, ok


def filter_mesh_vertices(
    verts: np.ndarray, tris: np.ndarray, keep: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Drop masked-out vertices and every triangle touching one
    (o3d remove_vertices_by_mask equivalent, utils/mesher.py:419-421).
    Returns (verts, tris, old->kept vertex index of survivors)."""
    keep = np.asarray(keep, bool)
    remap = np.full(len(verts), -1, np.int64)
    kept_idx = np.flatnonzero(keep)
    remap[kept_idx] = np.arange(len(kept_idx))
    tri_keep = keep[tris].all(-1)
    return verts[keep], remap[tris[tri_keep]], kept_idx


# SemanticKITTI label palette (BGR in the dataset spec; stored here as RGB
# in [0,1]) for the 20-class remapped training ids — the public color
# convention used by the reference's sem_kitti_color_map.
SEM_KITTI_COLORS = (
    np.array(
        [
            (0, 0, 0),  # 0 unlabeled / free space
            (100, 150, 245),  # 1 car
            (100, 230, 245),  # 2 bicycle
            (30, 60, 150),  # 3 motorcycle
            (80, 30, 180),  # 4 truck
            (0, 0, 255),  # 5 other-vehicle
            (255, 30, 30),  # 6 person
            (255, 40, 200),  # 7 bicyclist
            (150, 30, 90),  # 8 motorcyclist
            (255, 0, 255),  # 9 road
            (255, 150, 255),  # 10 parking
            (75, 0, 75),  # 11 sidewalk
            (175, 0, 75),  # 12 other-ground
            (255, 200, 0),  # 13 building
            (255, 120, 50),  # 14 fence
            (0, 175, 0),  # 15 vegetation
            (135, 60, 0),  # 16 trunk
            (150, 240, 80),  # 17 terrain
            (255, 240, 150),  # 18 pole
            (255, 0, 0),  # 19 traffic-sign
        ],
        np.float64,
    )
    / 255.0
)


def _weld_mesh(
    tri_soup: np.ndarray, mc_res: float, min_cluster_vertices: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge duplicate vertices (quantized to a fraction of the cell size)
    and optionally drop small connected components
    (utils/mesher.py:445-458 semantics)."""
    flat = tri_soup.reshape(-1, 3)
    key = np.round(flat / (mc_res * 1e-3)).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    # representative position: first occurrence of each welded vertex
    first = np.full(len(uniq), len(flat), np.int64)
    np.minimum.at(first, inv, np.arange(len(flat)))
    verts = flat[first]
    tris = inv.reshape(-1, 3)
    # drop degenerate triangles
    good = (
        (tris[:, 0] != tris[:, 1])
        & (tris[:, 1] != tris[:, 2])
        & (tris[:, 0] != tris[:, 2])
    )
    tris = tris[good]

    if min_cluster_vertices > 1 and len(verts):
        parent = np.arange(len(verts))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for a, b, c in tris:
            ra, rb, rc = find(a), find(b), find(c)
            parent[rb] = ra
            parent[rc] = ra
        roots = np.array([find(i) for i in range(len(verts))])
        counts = np.bincount(roots, minlength=len(verts))
        keep_v = counts[roots] >= min_cluster_vertices
        keep_t = keep_v[tris].all(-1)
        tris = tris[keep_t]
    return verts.astype(np.float32), tris
