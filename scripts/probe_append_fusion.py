#!/usr/bin/env python3
"""Reproduce the 24 ms pool-append scatter fusion pathology and test
optimization_barrier fixes. A bare 256k-row scatter runs at 0.3 ns/row;
inside the fused append (row building + cumsum + scatter) the trace shows
92 ns/row. Where's the cliff?

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_append_fusion.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.mapping import pool as pl

P = 1 << 21
M = 1 << 18
C = 1


def timeit(fn, *args, n=8, warmup=2):
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


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    pool = pl.init_pool(P, 1 << 15, C)
    pool = pool._replace(size=jnp.asarray(P // 2, jnp.int32))
    coords = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    sdf = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    weight = jnp.ones((M,), jnp.float32)
    mask = jnp.asarray(rng.random(M) < 0.5)
    is_new = jnp.asarray(rng.random(M) < 0.1)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def append(pool, coords, sdf, weight, mask, is_new, key):
        return pl.append_samples(
            pool, coords, sdf, weight, mask, 7, is_new, key=key
        )

    t = timeit(append, pool, coords, sdf, weight, mask, is_new, key)
    print(f"append_samples (as in prod):   {t:7.2f} ms", flush=True)

    # variant: barrier between row building and the scatter
    @jax.jit
    def append_barrier(pool, coords, sdf, weight, mask, is_new, key):
        p = pool.data.shape[0]
        m = coords.shape[0]
        offs = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dst = pool.size + offs
        write = mask & (dst < p)
        overflow = mask & (dst >= p)
        rand_old = jax.random.randint(
            key, mask.shape, 0, jnp.maximum(pool.size, 1)
        )
        dst = jnp.where(overflow, rand_old, dst)
        write = write | overflow
        slot = jnp.where(write, dst, p)
        d = pool.data.shape[1]
        rows = jnp.zeros((m, d), jnp.float32)
        rows = rows.at[:, 0:3].set(coords)
        rows = rows.at[:, 3].set(sdf)
        rows = rows.at[:, 4].set(weight)
        rows = rows.at[:, 5].set(7.0)
        rows = rows.at[:, 6].set(-1.0)
        rows, slot = jax.lax.optimization_barrier((rows, slot))
        data = pool.data.at[slot].set(rows, mode="drop")
        valid = pool.valid.at[slot].set(True, mode="drop")
        return data, valid

    t = timeit(append_barrier, pool, coords, sdf, weight, mask, is_new, key)
    print(f"append with opt barrier:       {t:7.2f} ms", flush=True)

    # variant: rows built by concatenate instead of .at sets
    @jax.jit
    def append_concat(pool, coords, sdf, weight, mask, is_new, key):
        p = pool.data.shape[0]
        offs = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dst = pool.size + offs
        write = mask & (dst < p)
        slot = jnp.where(write, dst, p)
        rows = jnp.concatenate(
            [
                coords,
                sdf[:, None],
                weight[:, None],
                jnp.full((M, 1), 7.0),
                jnp.full((M, 1), -1.0),
                jnp.zeros((M, 1 + C), jnp.float32),
            ],
            axis=1,
        )
        data = pool.data.at[slot].set(rows, mode="drop")
        valid = pool.valid.at[slot].set(True, mode="drop")
        return data, valid

    t = timeit(append_concat, pool, coords, sdf, weight, mask, is_new, key)
    print(f"append rows-by-concat:         {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
