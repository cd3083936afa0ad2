#!/usr/bin/env python3
"""Mosaic gather lowering probe at the mapping-loop's real shapes:
table = work slab f32[98304, 8] (VMEM-resident), idx = the frame's sorted
flat kNN references s32[98304], out f32[98304, 8].

Variants:
  a. direct ref indexing        out = table_ref[idx_ref[:], :]
  b. jnp.take axis=0            out = jnp.take(table, idx, axis=0)
  c. transposed lane gather     table [8, W]; out = take_along_axis(axis=1)
  d. per-row loop with pl.ds    fori over rows (expected slow; correctness)
Each is timed over 20 reps inside one jit (so dispatch amortizes), and
validated against XLA's gather.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, F = 98304, 8


def bench(fn, *args, M=20, n=3):
    @jax.jit
    def run(*a):
        def body(i, acc):
            r = fn(*a)
            return acc + r[0, 0]
        return jax.lax.fori_loop(0, M, body, jnp.zeros((), jnp.float32))

    r = run(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / M * 1e3


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(W, F)).astype(np.float32))
    # sorted-ish indices like the real sorted_idx (duplicates, ascending)
    idx_np = np.sort(rng.integers(0, W, size=(W,))).astype(np.int32)
    idx = jnp.asarray(idx_np)
    ref = np.asarray(table)[idx_np]

    def try_variant(name, make_fn):
        try:
            fn = make_fn()
            got = np.asarray(fn(idx, table))
            ok = np.allclose(ref, got)
            ms = bench(fn, idx, table)
            gbs = W * F * 4 * 2 / ms / 1e6
            print(f"{name}: {ms:.3f} ms ({gbs:.1f} GB/s) correct={ok}",
                  flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:240]}",
                  flush=True)

    # a. direct ref indexing
    def make_a():
        def kernel(idx_ref, table_ref, out_ref):
            out_ref[:] = table_ref[idx_ref[:], :]

        return jax.jit(lambda i, t: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((W, F), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, t))

    # b. jnp.take
    def make_b():
        def kernel(idx_ref, table_ref, out_ref):
            out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

        return jax.jit(lambda i, t: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((W, F), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, t))

    # c. transposed lane gather: tableT [8, W], idxb [8, W]
    def make_c():
        def kernel(idx_ref, tableT_ref, out_ref):
            ib = jnp.broadcast_to(idx_ref[:][None, :], (F, W))
            out_ref[:] = jnp.take_along_axis(tableT_ref[:], ib, axis=1)

        inner = lambda i, tT: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((F, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, tT)

        def fn(i, t):
            return inner(i, t.T).T

        return jax.jit(fn)

    try_variant("a ref[idx,:]", make_a)
    try_variant("b jnp.take  ", make_b)
    try_variant("c laneT take", make_c)

    # XLA baseline
    xla = jax.jit(lambda i, t: t[i])
    ms = bench(xla, idx, table)
    print(f"x XLA gather : {ms:.3f} ms ({W*F*4*2/ms/1e6:.1f} GB/s)",
          flush=True)


if __name__ == "__main__":
    main()
