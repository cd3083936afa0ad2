#!/usr/bin/env python3
"""Pool append formulations under a column-major-forcing consumer.

The step HLO shows pool.data [2M,9] gets layout {0,1} (column-major,
forced by full-pool column passes like filter_pool's d2); the row-scatter
append then writes 9 strided locations per row -> 92 ns/row. Variants:
  A: row scatter (current) fused with a d2 column pass
  B: per-column scatters (work WITH the layout)
  C: SoA: separate 1-D arrays, 1-D scatters
Each jit includes a full-pool d2 pass so layout assignment faces the same
pressure as the real step.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_pool_variants.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 21
M = 1 << 18
D = 9


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
    data = jnp.asarray(rng.normal(size=(P, D)).astype(np.float32))
    slot = jnp.asarray(rng.integers(0, P, size=(M,)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32))
    origin = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))

    @jax.jit
    def var_a(data, rows, slot, origin):
        d2 = jnp.sum((data[:, 0:3] - origin) ** 2, axis=-1)
        keep = d2 < 100.0
        out = data.at[slot].set(rows, mode="drop")
        return out, keep

    print(f"A row-scatter + col pass:   {timeit(var_a, data, rows, slot, origin):7.2f} ms", flush=True)

    @jax.jit
    def var_b(data, rows, slot, origin):
        d2 = jnp.sum((data[:, 0:3] - origin) ** 2, axis=-1)
        keep = d2 < 100.0
        out = data
        for c in range(D):
            out = out.at[slot, c].set(rows[:, c], mode="drop")
        return out, keep

    print(f"B col-scatters + col pass:  {timeit(var_b, data, rows, slot, origin):7.2f} ms", flush=True)

    cols = tuple(jnp.asarray(rng.normal(size=(P,)).astype(np.float32)) for _ in range(D))
    rcols = tuple(jnp.asarray(rng.normal(size=(M,)).astype(np.float32)) for _ in range(D))

    @jax.jit
    def var_c(cols, rcols, slot, origin):
        d2 = (
            (cols[0] - origin[0]) ** 2
            + (cols[1] - origin[1]) ** 2
            + (cols[2] - origin[2]) ** 2
        )
        keep = d2 < 100.0
        out = tuple(
            c.at[slot].set(r, mode="drop") for c, r in zip(cols, rcols)
        )
        return out, keep

    print(f"C SoA 1-D scatters + pass:  {timeit(var_c, cols, rcols, slot, origin):7.2f} ms", flush=True)

    # batch row-gather from each storage form
    idx = jnp.asarray(rng.integers(0, P, size=(16384,)).astype(np.int32))

    @jax.jit
    def gath_a(data, idx, origin):
        d2 = jnp.sum((data[:, 0:3] - origin) ** 2, axis=-1)
        return data[idx], jnp.sum(d2)

    print(f"A row-gather 16k (+pass):   {timeit(gath_a, data, idx, origin):7.2f} ms", flush=True)

    @jax.jit
    def gath_c(cols, idx, origin):
        d2 = (cols[0] - origin[0]) ** 2
        return tuple(c[idx] for c in cols), jnp.sum(d2)

    print(f"C col-gathers 16k (+pass):  {timeit(gath_c, cols, idx, origin):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
