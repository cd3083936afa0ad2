#!/usr/bin/env python3
"""Is the 24 ms/frame pool-append scatter a row-width/layout artifact?

Trace shows: scatter of 262k rows into f32[2M,9]{0,1:T(8,128)} takes
24 ms (~92 ns/row) while the [4M,4]{0,1:T(4,128)} mirror gather runs at
1.4 ns/row. Hypothesis: a 9-wide row straddles two (8,128) tiles in the
column-major layout; an 8-wide row lands in exactly one.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_scatter_layout.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 21
M = 1 << 18


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
    slot = jnp.asarray(rng.integers(0, P, size=(M,)).astype(np.int32))
    slot_seq = jnp.asarray(
        (np.arange(M, dtype=np.int32) * 7) % P
    )  # mostly-sequentialish

    for width in (4, 8, 9, 12, 16):
        data = jnp.zeros((P, width), jnp.float32)
        rows = jnp.asarray(rng.normal(size=(M, width)).astype(np.float32))

        @jax.jit
        def scat(data, rows, slot):
            return data.at[slot].set(rows, mode="drop")

        t = timeit(scat, data, rows, slot)
        print(f"scatter {M>>10}k rows into [{P>>20}M,{width:2d}]: "
              f"{t:7.2f} ms  ({t*1e6/M:5.1f} ns/row)", flush=True)

    # split 8 + 1 (two scatters)
    d8 = jnp.zeros((P, 8), jnp.float32)
    d1 = jnp.zeros((P, 1), jnp.float32)
    r8 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    r1 = jnp.asarray(rng.normal(size=(M, 1)).astype(np.float32))

    @jax.jit
    def scat2(d8, d1, r8, r1, slot):
        return d8.at[slot].set(r8, mode="drop"), d1.at[slot].set(
            r1, mode="drop"
        )

    t = timeit(scat2, d8, d1, r8, r1, slot)
    print(f"split scatter [2M,8]+[2M,1]:     {t:7.2f} ms", flush=True)

    # 1-D bool scatter (valid mask)
    db = jnp.zeros((P,), bool)

    @jax.jit
    def scatb(db, slot):
        return db.at[slot].set(True, mode="drop")

    t = timeit(scatb, db, slot)
    print(f"bool scatter [2M]:               {t:7.2f} ms", flush=True)

    # gather comparison 9 vs 8 wide
    data9 = jnp.asarray(rng.normal(size=(P, 9)).astype(np.float32))
    data8 = jnp.asarray(rng.normal(size=(P, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, size=(16384,)).astype(np.int32))
    t = timeit(jax.jit(lambda d, i: d[i]), data9, idx)
    print(f"gather 16k rows from [2M,9]:     {t:7.2f} ms", flush=True)
    t = timeit(jax.jit(lambda d, i: d[i]), data8, idx)
    print(f"gather 16k rows from [2M,8]:     {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
