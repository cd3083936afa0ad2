#!/usr/bin/env python3
"""Bisect which pipeline executable poisons the axon fast dispatch path."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.models import neural_map as nm
from clid_slam_tpu.ops.voxel import voxel_down_sample_mask


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

    state = nm.init_map(1 << 20, 1 << 22, 8)
    jax.block_until_ready(state.count)
    lat("after init_map")

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-40, 40, (100_000, 3)).astype(np.float32))
    mask = jnp.ones((100_000,), bool)
    td = jnp.zeros((64,), jnp.float32)
    lat("after uploads")

    m = voxel_down_sample_mask(pts, mask, 0.4, 1 << 22)
    jax.block_until_ready(m)
    lat("after voxel_down_sample_mask")

    state, _ = nm.insert_points(
        state, pts, mask, 0.4, td, 0, 1e9, downsample=False
    )
    jax.block_until_ready(state.count)
    lat("after insert_points")


if __name__ == "__main__":
    main()
