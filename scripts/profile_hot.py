#!/usr/bin/env python3
"""Dissect the hot-path cost on the real TPU: which op inside the
query / h_reduce / mapping step actually burns the time.

IMPORTANT: no jitted function here may close over a *device* array — a
captured committed jnp constant knocks the axon runtime off its fast
dispatch path session-wide (measured r1: +30 ms on every later dispatch).
Everything flows through arguments.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/profile_hot.py
"""

import time
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.ops.voxel import neighbor_hash_soa, neighbor_offsets
from clid_slam_tpu.odometry import iekf


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)  # ms


CAP = 1 << 20
HSIZE = 1 << 22
F = 8
res = 0.4
knn_k = 6
NB_OFFS = neighbor_offsets(2, 0.5)  # K=81, numpy constant (safe to close over)
K = NB_OFFS.shape[0]
MVD2 = 3.0 * ((2 + 1) * res) ** 2


@jax.jit
def f_trivial(x):
    return x + 1.0


@jax.jit
def f_hash(p):
    return neighbor_hash_soa(p, NB_OFFS, res, HSIZE)


@jax.jit
def f_gather(mirror, h):
    return mirror[h]


@jax.jit
def f_probe(state, p, td):
    return nm.neighborhood_probe(state, p, NB_OFFS, res, MVD2, td, 0, 1e9, True)


@jax.jit
def f_topk(d):
    return jax.lax.top_k(-d, knn_k)


@jax.jit
def f_query(state, p, td):
    return nm.query_feature(state, p, NB_OFFS, res, MVD2, knn_k, td, 0, 1e9, True)


@jax.jit
def f_mlp(mlp, x):
    return dec.sdf(mlp, x, 0.1)


@jax.jit
def f_qm(state, mlp, p, td):
    q = nm.query_feature(state, p, NB_OFFS, res, MVD2, knn_k, td, 0, 1e9, True)
    return dec.sdf(mlp, q.feature, 0.1)


def _sdf_sum(p, state, mlp, td):
    q = nm.query_feature(state, p, NB_OFFS, res, MVD2, knn_k, td, 0, 1e9, True)
    pred = dec.sdf(mlp, q.feature, 0.1)
    return jnp.sum(pred), pred


@jax.jit
def f_qmg(state, mlp, p, td):
    return jax.grad(_sdf_sum, has_aux=True)(p, state, mlp, td)


def _loss_feats(feats, state, mlp, p, td):
    st = state._replace(geo_feats=feats)
    q = nm.query_feature(st, p, NB_OFFS, res, MVD2, knn_k, td, 0, 1e9, True)
    pred = dec.sdf(mlp, q.feature, 0.1)
    return jnp.sum(pred ** 2)


@jax.jit
def f_gf(state, mlp, p, td):
    return jax.grad(_loss_feats)(state.geo_feats, state, mlp, p, td)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)

    # dispatch overhead FIRST, on a clean session
    xs = jnp.zeros((8, 128))
    print(f"trivial dispatch: {timeit(f_trivial, xs):.3f} ms", flush=True)

    rng = np.random.default_rng(0)
    N_PTS = 100_000
    pts = rng.uniform(-40, 40, (N_PTS, 3)).astype(np.float32)

    state = nm.init_map(CAP, HSIZE, F)
    td = jnp.zeros((64,), jnp.float32)
    state, _ = nm.insert_points(
        state, jnp.asarray(pts), jnp.ones((N_PTS,), bool), res, td, 0, 1e9,
        downsample=False,
    )
    jax.block_until_ready(state.count)
    print(f"# map count: {int(state.count)}", flush=True)
    print(f"trivial dispatch (after insert): {timeit(f_trivial, xs):.3f} ms", flush=True)

    N = 8192
    q = jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32))

    print(f"hash_soa [N,{K}]: {timeit(f_hash, q):.3f} ms", flush=True)
    h = f_hash(q)
    print(f"mirror gather [N,{K},4]: {timeit(f_gather, state.hash_mirror, h):.3f} ms", flush=True)
    print(f"probe full: {timeit(f_probe, state, q, td):.3f} ms", flush=True)

    d2, hh, valid, mir = f_probe(state, q, td)
    d2s = jnp.where(valid, d2, 9e3)
    print(f"top_k {K}->{knn_k}: {timeit(f_topk, d2s):.3f} ms", flush=True)

    print(f"query_feature full: {timeit(f_query, state, q, td):.3f} ms", flush=True)

    mlp = dec.init_mlp(jax.random.PRNGKey(0), F + 3, 64, 1, 1)
    feat = f_query(state, q, td).feature
    print(f"mlp fwd [N,{F+3}]: {timeit(f_mlp, mlp, feat):.3f} ms", flush=True)
    print(f"query+mlp fwd: {timeit(f_qm, state, mlp, q, td):.3f} ms", flush=True)
    print(f"query+mlp+grad(points): {timeit(f_qmg, state, mlp, q, td):.3f} ms", flush=True)

    h_red = iekf.make_h_reduce_fn(
        knn_k=knn_k, nb_offs=NB_OFFS, resolution=res, max_valid_dist2=MVD2,
        sdf_scale=0.1, min_grad_norm=0.5, max_grad_norm=1.5, min_nn_count=2,
    )
    mask = jnp.ones((N,), bool)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    print(f"h_reduce full: {timeit(h_red, state, mlp, q, mask, R, t, td, 0, 1e9):.3f} ms", flush=True)

    bs = 16384
    qb = jnp.asarray(rng.uniform(-40, 40, (bs, 3)).astype(np.float32))
    print(f"train-batch grad(feats) bs={bs}: {timeit(f_gf, state, mlp, qb, td):.3f} ms", flush=True)

    print(f"trivial dispatch (end): {timeit(f_trivial, xs):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
