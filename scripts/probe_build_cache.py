#!/usr/bin/env python3
"""Sub-piece timing of the mapping build_cache + cached tracker iteration,
at bench shapes, to locate the ~63 ms fixed mapping cost and the
~2.9 ms/iter tracking cost.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_build_cache.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.ops.voxel import (
    grid_coords,
    neighbor_hash_soa,
    neighbor_offsets,
    voxel_hash,
)

BS = 16384
K = 81
KNN = 6
NCAND = 16
CAP = 1 << 20
H = 1 << 22
F = 8
S = 8192


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def topk_iterative(neg_d2, k):
    """k passes of masked argmax over the last axis; returns (vals, idx)."""
    n = neg_d2.shape[-1]
    iot = jax.lax.broadcasted_iota(jnp.int32, neg_d2.shape, neg_d2.ndim - 1)
    x = neg_d2
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(x, axis=-1)
        am = jnp.argmax(x, axis=-1)
        vals.append(m)
        idxs.append(am)
        x = jnp.where(iot == am[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    nb = neighbor_offsets(2, 0.5)
    nb33 = neighbor_offsets(2, 0.2)

    pts = jnp.asarray(rng.normal(size=(BS, 3)).astype(np.float32) * 20.0)
    mirror = jnp.asarray(rng.normal(size=(H, 4)).astype(np.float32))
    table = jnp.asarray(rng.integers(0, CAP, size=(H,)).astype(np.int32))
    feats = jnp.asarray(rng.normal(size=(CAP + 1, F)).astype(np.float32))
    d2r = jnp.asarray(rng.normal(size=(BS, K)).astype(np.float32) ** 2)
    d2r16 = jnp.asarray(rng.normal(size=(S, NCAND)).astype(np.float32) ** 2)
    safe = jnp.asarray(rng.integers(0, CAP, size=(BS, KNN)).astype(np.int32))

    t = timeit(jax.jit(lambda p: neighbor_hash_soa(p, nb, 0.4, H)), pts)
    print(f"hash compute [16k x 81]:        {t:7.2f} ms")

    h81 = neighbor_hash_soa(pts, nb, 0.4, H)

    t = timeit(jax.jit(lambda h: mirror[h]), h81)
    print(f"mirror gather [16k x 81 x 4]:   {t:7.2f} ms")

    h33 = neighbor_hash_soa(pts, nb33, 0.4, H)
    t = timeit(jax.jit(lambda h: mirror[h]), h33)
    print(f"mirror gather [16k x 33 x 4]:   {t:7.2f} ms")

    t = timeit(jax.jit(lambda d: jax.lax.top_k(-d, KNN)), d2r)
    print(f"lax.top_k k=6   [16k x 81]:     {t:7.2f} ms")
    t = timeit(jax.jit(lambda d: topk_iterative(-d, KNN)), d2r)
    print(f"iter argmax k=6 [16k x 81]:     {t:7.2f} ms")
    t = timeit(jax.jit(lambda d: jax.lax.top_k(-d, NCAND)), d2r)
    print(f"lax.top_k k=16  [16k x 81]:     {t:7.2f} ms")
    t = timeit(jax.jit(lambda d: topk_iterative(-d, NCAND)), d2r)
    print(f"iter argmax k=16[16k x 81]:     {t:7.2f} ms")
    t = timeit(jax.jit(lambda d: jax.lax.top_k(-d, KNN)), d2r16)
    print(f"lax.top_k k=6   [8k x 16]:      {t:7.2f} ms")
    t = timeit(jax.jit(lambda d: topk_iterative(-d, KNN)), d2r16)
    print(f"iter argmax k=6 [8k x 16]:      {t:7.2f} ms")

    # batch sort by hash
    keys = voxel_hash(grid_coords(pts, 0.4), H)
    t = timeit(jax.jit(lambda k: jnp.argsort(k)), keys)
    print(f"argsort 16k keys:               {t:7.2f} ms")

    # working-set extraction: cap-cumsum vs sort-unique over bs*k
    W = BS * KNN

    @jax.jit
    def ws_cumsum(safe):
        touched = jnp.zeros((CAP + 1,), jnp.int32).at[safe.reshape(-1)].set(1)
        loc = jnp.cumsum(touched) - 1
        local_idx = loc[safe]
        (src_rows,) = jnp.nonzero(touched, size=W, fill_value=CAP)
        return local_idx, src_rows

    t = timeit(ws_cumsum, safe)
    print(f"working-set cumsum [cap=1M]:    {t:7.2f} ms")

    @jax.jit
    def ws_sort(safe):
        flat = safe.reshape(-1)  # [W]
        order = jnp.argsort(flat)
        s = flat[order]
        isnew = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (s[1:] != s[:-1]).astype(jnp.int32)]
        )
        rank = jnp.cumsum(isnew) - 1  # local id in sorted order
        # scatter local ids back to original positions
        local_flat = jnp.zeros((W,), jnp.int32).at[order].set(rank)
        src_rows = jnp.full((W,), CAP, jnp.int32).at[rank].set(s)
        return local_flat.reshape(safe.shape), src_rows

    t = timeit(ws_sort, safe)
    print(f"working-set sort [98k]:         {t:7.2f} ms")

    # feature gather at working scale
    idxW = jnp.asarray(rng.integers(0, W, size=(BS, KNN)).astype(np.int32))
    featW = jnp.asarray(rng.normal(size=(W, F)).astype(np.float32))
    t = timeit(jax.jit(lambda i: featW[i]), idxW)
    print(f"feat gather [16k x 6] from 98k: {t:7.2f} ms")
    t = timeit(jax.jit(lambda i: feats[i]), safe)
    print(f"feat gather [16k x 6] from 1M:  {t:7.2f} ms")

    # zeros_like slabs (4 full slabs)
    t = timeit(
        jax.jit(lambda f: tuple(jnp.zeros_like(f) for _ in range(4))), feats
    )
    print(f"4x zeros_like [1M x 8]:         {t:7.2f} ms")

    # 18x18 equilibrated solve (tracker per-iteration)
    A = jnp.asarray(rng.normal(size=(18, 18)).astype(np.float32))
    A = A @ A.T + 18 * jnp.eye(18)
    B = jnp.asarray(rng.normal(size=(18, 37)).astype(np.float32))

    @jax.jit
    def solve(A, B):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-20))
        Dinv = 1.0 / d
        An = A * Dinv[:, None] * Dinv[None, :]
        Bn = B * Dinv[:, None]
        return jnp.linalg.solve(An, Bn) * Dinv[:, None]

    t = timeit(solve, A, B)
    print(f"18x18 solve (linalg.solve):     {t:7.2f} ms")

    # same via explicit Gauss-Jordan... use cholesky
    @jax.jit
    def solve_cho(A, B):
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    t = timeit(solve_cho, A, B)
    print(f"18x18 solve (cholesky):         {t:7.2f} ms")

    # tap geometry build at bench shapes (bd=1638, k=6, pe dim 8?)
    bd = BS // 10
    vec_d = jnp.asarray(rng.normal(size=(bd, KNN, 3)).astype(np.float32))

    @jax.jit
    def taps(vec_d):
        eps3 = jnp.eye(3, dtype=jnp.float32) * 0.04
        tap_off = jnp.concatenate([eps3, -eps3], axis=0)
        tap_vec = vec_d[None] + tap_off[:, None, None, :]
        tap_d2 = jnp.sum(tap_vec * tap_vec, axis=-1)
        w = 1.0 / (tap_d2 + 1e-15)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return tap_vec, w

    t = timeit(taps, vec_d)
    print(f"tap geometry [6 x 1638 x 6]:    {t:7.2f} ms")


if __name__ == "__main__":
    main()
