#!/usr/bin/env python3
"""Can Pallas/Mosaic beat XLA's ~7ns/row gather with a VMEM-resident table?

Tests which gather formulations Mosaic can lower, and their speed:
  A. jnp.take(table, idx) with table+idx in VMEM (one block)
  B. take_along_axis on the lane dim (known-supported DynamicGatherOp)
  C. one-hot matmul against a tiny table tile (MXU)

Run: PYTHONPATH=.:$PYTHONPATH python scripts/probe_pallas_gather.py
"""

import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, M=20, n=3):
    @jax.jit
    def run(*a):
        def body(i, acc):
            r = fn(*a)
            return acc + jax.tree.leaves(r)[0][0, 0]
        return jax.lax.fori_loop(0, M, body, jnp.zeros((), jnp.float32))

    r = run(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = run(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) / M * 1e3


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---------------------------------------------------------- variant A
    # table [Ht, 4] f32 in VMEM; idx [N, K] i32; out [N*K, 4]
    Ht = 1 << 15  # 32768 rows = 512 KB
    NK = 128 * 1024  # 1.3M total lookups would be 16384*81; test 131k first

    table = jnp.asarray(rng.normal(size=(Ht, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, Ht, size=(NK,)).astype(np.int32))

    def kernel_a(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def gather_a(idx, table):
        return pl.pallas_call(
            kernel_a,
            out_shape=jax.ShapeDtypeStruct((NK, 4), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    try:
        ms = bench(gather_a, idx, table)
        ref = np.asarray(table)[np.asarray(idx)]
        got = np.asarray(gather_a(idx, table))
        ok = np.allclose(ref, got)
        print(f"A jnp.take VMEM table[{Ht},4] R={NK}: {ms:.3f} ms "
              f"({NK/ms/1e6:.0f} Mrow/s) correct={ok}", flush=True)
    except Exception as e:
        print(f"A FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --------------------------------------------------- variant A2: wider
    Ht2 = 1 << 14
    table2 = jnp.asarray(rng.normal(size=(Ht2, 128)).astype(np.float32))
    N2 = 16384
    idx2 = jnp.asarray(rng.integers(0, Ht2, size=(N2,)).astype(np.int32))

    def kernel_a2(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def gather_a2(idx, table):
        return pl.pallas_call(
            kernel_a2,
            out_shape=jax.ShapeDtypeStruct((N2, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2, table2)

    try:
        ms = bench(gather_a2, idx2, table2)
        ref = np.asarray(table2)[np.asarray(idx2)]
        got = np.asarray(gather_a2(idx2, table2))
        ok = np.allclose(ref, got)
        print(f"A2 jnp.take VMEM table[{Ht2},128] R={N2}: {ms:.3f} ms "
              f"({N2/ms/1e6:.0f} Mrow/s, {N2*512/ms/1e6:.1f} GB/s) "
              f"correct={ok}", flush=True)
    except Exception as e:
        print(f"A2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ------------------------------------------- variant B: lane gather
    # take_along_axis along last dim: [8, 128] tiles
    N3, K3 = 16384, 128
    src = jnp.asarray(rng.normal(size=(N3, K3)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, K3, size=(N3, K3)).astype(np.int32))

    def kernel_b(sel_ref, src_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], sel_ref[:], axis=1)

    @jax.jit
    def gather_b(sel, src):
        return pl.pallas_call(
            kernel_b,
            out_shape=jax.ShapeDtypeStruct((N3, K3), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(sel, src)

    try:
        ms = bench(gather_b, sel, src)
        ref = np.take_along_axis(np.asarray(src), np.asarray(sel), axis=1)
        ok = np.allclose(ref, np.asarray(gather_b(sel, src)))
        print(f"B take_along_axis [N={N3},K={K3}] lane-gather: {ms:.3f} ms "
              f"({N3*K3/ms/1e6:.0f} Mel/s) correct={ok}", flush=True)
    except Exception as e:
        print(f"B FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # --------------------- XLA baseline for the same compact-table gather
    def xla_gather(idx, table):
        return table[idx]

    ms = bench(jax.jit(xla_gather), idx, table)
    print(f"XLA gather table[{Ht},4] R={NK}: {ms:.3f} ms "
          f"({NK/ms/1e6:.0f} Mrow/s)", flush=True)


if __name__ == "__main__":
    main()
