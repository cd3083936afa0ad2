#!/usr/bin/env python3
"""TPU gather cost model: per-row latency vs bytes throughput.

Times XLA gathers of R random rows x W floats from a table, looped inside
one jit (dispatch-free). If cost ~ R (not R*W), wide-row bucket layouts
beat narrow-row probes by the width factor.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/profile_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(make_body, carry, M=20, n=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, M, make_body, c)

    r = run(carry)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = run(carry)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / M * 1e3


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    H = 1 << 22  # 4M buckets

    for W in (1, 4, 8, 16, 32, 64, 128, 256):
        table = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
        for R in (16384, 131072, 1327104):
            if R * W * 4 > 600e6:
                continue
            idx = jnp.asarray(
                rng.integers(0, H, size=(R,)).astype(np.int32))

            def body(i, carry):
                ix, acc = carry
                ix2 = (ix + i) & (H - 1)
                g = table[ix2]
                return (ix, acc + jnp.sum(g[0]))

            ms = bench(body, (idx, 0.0))
            mb = R * W * 4 / 1e6
            print(
                f"gather R={R:8d} W={W:4d} ({mb:7.1f} MB): {ms:7.3f} ms  "
                f"{R/ms/1e6:6.1f} Mrow/s  {mb/ms:7.2f} GB/s",
                flush=True)

    # sorted indices: does locality help?
    W = 4
    table = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    R = 1327104
    idx_sorted = jnp.asarray(
        np.sort(rng.integers(0, H, size=(R,)).astype(np.int32)))

    def body_s(i, carry):
        ix, acc = carry
        g = table[ix]
        return (ix, acc + jnp.sum(g[0]) + i)

    ms = bench(body_s, (idx_sorted, 0.0))
    print(f"gather sorted R={R} W={W}: {ms:.3f} ms", flush=True)

    # small-table gather (fits VMEM): does table size change the cost?
    for Hs in (1 << 13, 1 << 16, 1 << 19):
        table_s = jnp.asarray(rng.normal(size=(Hs, 4)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, Hs, size=(R,)).astype(np.int32))

        def body_t(i, carry):
            ix, acc = carry
            ix2 = (ix + i) & (Hs - 1)
            g = table_s[ix2]
            return (ix, acc + jnp.sum(g[0]))

        ms = bench(body_t, (idx, 0.0))
        print(f"gather table={Hs} R={R} W=4: {ms:.3f} ms", flush=True)

    # scatter-add cost model (training backward)
    for R in (98304, 786432):
        idx = jnp.asarray(rng.integers(0, H, size=(R,)).astype(np.int32))
        upd = jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32))
        base = jnp.zeros((H, 8), jnp.float32)

        def body_sc(i, carry):
            b, acc = carry
            b2 = b.at[idx + i].add(upd, mode="drop")
            return (b2, acc + b2[0, 0])

        ms = bench(body_sc, (base, 0.0), M=10)
        print(f"scatter-add R={R} W=8: {ms:.3f} ms  {R/ms/1e6:.1f} Mrow/s",
              flush=True)

    # take_along_axis pattern used in query ([N,K] -> [N,k])
    N, K, k = 16384, 81, 6
    src = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, K, size=(N, k)).astype(np.int32))

    def body_ta(i, carry):
        s, acc = carry
        g = jnp.take_along_axis(src + i.astype(jnp.float32), s, axis=1)
        return (s, acc + jnp.sum(g[0]))

    ms = bench(body_ta, (sel, 0.0))
    print(f"take_along_axis [N={N},K={K}]->k={k}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
