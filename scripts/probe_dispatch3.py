#!/usr/bin/env python3
"""Verify causality: does a captured-device-constant jit REALLY poison the
session, or was probe1 seeing shared-TPU contention?"""

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
    print(
        f"{tag}: med {np.median(ts)*1e3:.3f} ms  "
        f"p10 {np.percentile(ts,10)*1e3:.3f}  p90 {np.percentile(ts,90)*1e3:.3f}",
        flush=True,
    )


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    lat("baseline-1")
    lat("baseline-2")

    const = jnp.ones((128,), jnp.float32)

    @jax.jit
    def captured(x):
        return x[:128] + const

    r = captured(jnp.zeros((8, 128)))
    jax.block_until_ready(r)
    lat("after captured-constant COMPILE+RUN")

    # run it a few more times
    for _ in range(5):
        r = captured(jnp.zeros((8, 128)))
    jax.block_until_ready(r)
    lat("after captured-constant more runs")

    time.sleep(5)
    lat("after 5s sleep")
    time.sleep(20)
    lat("after 25s sleep")


if __name__ == "__main__":
    main()
