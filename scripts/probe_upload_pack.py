#!/usr/bin/env python3
"""A/B: per-frame upload cost of the current 10-buffer argument set vs a
packed 2-buffer set, pipelined over the axon tunnel.

Run: PYTHONPATH=.:/root/.axon_site python scripts/probe_upload_pack.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    p_cap = 1 << 15
    buf = np.random.rand(p_cap, 3).astype(np.float32)
    mask = np.ones(p_cap, bool)
    tsb = np.zeros(p_cap, np.float32)
    imu = np.zeros((64, 7), np.float32)
    packed = np.concatenate(
        [buf, mask[:, None].astype(np.float32), tsb[:, None]], axis=1
    )  # [p_cap, 5]
    aux = np.zeros((65, 7), np.float32)
    aux[:64] = imu

    def set_a():
        return (
            jnp.asarray(buf),
            jnp.asarray(mask),
            jnp.asarray(tsb),
            jnp.asarray(imu),
            jnp.asarray(3, jnp.int32),
            jnp.asarray(60.0, jnp.float32),
            jnp.asarray(10, jnp.int32),
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(True),
            jnp.asarray(7, jnp.int32),
        )

    def set_b():
        return (jnp.asarray(packed), jnp.asarray(aux))

    for name, fn in [("A 10-buf", set_a), ("B 2-buf", set_b)] * 2:
        ys = []
        t0 = time.perf_counter()
        for _ in range(20):
            ys.append(fn())
        jax.block_until_ready(ys)
        print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
