#!/usr/bin/env python3
"""Does a scalar device->host read (int(x)) poison the axon fast path?"""

import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def f_trivial(x):
    return x + 1.0


def lat(tag, n=40):
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
    print(f"{tag}: med {np.median(ts)*1e3:.3f} ms", flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    lat("baseline")

    s = jnp.sum(jnp.arange(16))
    jax.block_until_ready(s)
    lat("after device scalar compute")

    v = int(s)
    print(f"# int() = {v}", flush=True)
    lat("after int(scalar)")

    arr = jnp.zeros((128, 4))
    a = np.asarray(arr)
    print(f"# np sum = {a.sum()}", flush=True)
    lat("after np.asarray(small array)")

    big = jnp.zeros((1 << 20, 4))
    b = np.asarray(big)
    lat("after np.asarray(16MB)")


if __name__ == "__main__":
    main()
