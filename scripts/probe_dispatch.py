#!/usr/bin/env python3
"""Find what knocks the axon TPU runtime off its fast dispatch path.

Measures trivial-dispatch latency after each suspect operation.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def f_trivial(x):
    return x + 1.0


def lat(tag, n=30):
    xs = jnp.zeros((8, 128))
    for _ in range(3):
        r = f_trivial(xs)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f_trivial(xs)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {np.median(ts)*1e3:.3f} ms", flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    lat("baseline")

    # 1. allocate a medium array
    a = jnp.zeros((1 << 20,), jnp.float32)  # 4 MB
    jax.block_until_ready(a)
    lat("after 4MB alloc")

    # 2. allocate a big array
    b = jnp.zeros((1 << 22, 4), jnp.float32)  # 64 MB
    jax.block_until_ready(b)
    lat("after 64MB alloc")

    del a, b
    lat("after free")

    # 3. run a jitted fn WITH donation on a big arg
    @jax.jit
    def donated(x):
        return x * 2.0

    big = jnp.zeros((1 << 22, 4), jnp.float32)
    donated_j = jax.jit(lambda x: x * 2.0, donate_argnums=(0,))
    big = donated_j(big)
    jax.block_until_ready(big)
    lat("after donated call (64MB)")
    del big
    lat("after free 2")

    # 4. scatter op (at[].set) on a big array
    big2 = jnp.zeros((1 << 22,), jnp.int32)
    idx = jnp.arange(1024, dtype=jnp.int32)

    @jax.jit
    def scat(t, i):
        return t.at[i].set(1)

    big2 = scat(big2, idx)
    jax.block_until_ready(big2)
    lat("after scatter on 16MB")
    del big2
    lat("after free 3")

    # 5. many live buffers
    keep = [jnp.zeros((1 << 18,), jnp.float32) for _ in range(32)]
    jax.block_until_ready(keep)
    lat("after 32x1MB live")
    del keep
    lat("after free 4")

    # 6. committed constant captured in a jit (the r1 suspect)
    const = jnp.ones((128,), jnp.float32)

    @jax.jit
    def captured(x):
        return x[:128] + const

    r = captured(jnp.zeros((8, 128)))
    jax.block_until_ready(r)
    lat("after captured-constant jit")


if __name__ == "__main__":
    main()
