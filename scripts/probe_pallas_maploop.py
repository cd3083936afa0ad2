#!/usr/bin/env python3
"""Compile + time the fused mapping-loop Pallas kernel on the real TPU at
production shapes (bs 16384, k 6, F 8, bd 1638, 10 iterations)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from clid_slam_tpu.ops.pallas_mapping import make_pallas_map_loop

BS, K, F, P, H = 16384, 6, 8, 3, 64
BD_, DEC = 1638, 10


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    run = make_pallas_map_loop(
        bs=BS, knn_k=K, feature_dim=F, pos_dim=P, hidden=H,
        bd=BD_, dec_step=DEC, sdf_scale=0.055, sigma=0.055,
        lr=0.01, adam_eps=1e-15, weight_e=0.5, num_grad_eps=0.08,
        chunk=4096,
    )
    BD = ((BD_ + 127) // 128) * 128
    fT = jnp.asarray(rng.normal(0, 0.1, (K * F, BS)).astype(np.float32))
    w0T = jnp.asarray(
        np.abs(rng.normal(0, 0.3, (8, BS))).astype(np.float32)
    )
    encw0T = jnp.asarray(rng.normal(0, 0.2, (8, BS)).astype(np.float32))
    rowsT = jnp.asarray(
        np.abs(rng.normal(0, 0.5, (8, BS))).astype(np.float32)
    )
    wtapT = jnp.asarray(
        np.abs(rng.normal(0, 0.3, (40, BD))).astype(np.float32)
    )
    enctapwT = jnp.asarray(rng.normal(0, 0.2, (24, BD)).astype(np.float32))
    vdT = jnp.asarray(
        (rng.uniform(size=(8, BD)) < 0.9).astype(np.float32)
    )
    W1p = jnp.asarray(rng.normal(0, 0.3, (16, H)).astype(np.float32))
    b1v = jnp.asarray(rng.normal(0, 0.1, (H, 1)).astype(np.float32))
    WoutT8 = jnp.asarray(rng.normal(0, 0.3, (8, H)).astype(np.float32))
    boutA = jnp.zeros((1, 1), jnp.float32)

    t0 = time.perf_counter()
    out = run(fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT,
              W1p, b1v, WoutT8, boutA, 10, 0.01, 1e-4, 1e-3)
    jax.block_until_ready(out)
    print(f"# compile+first run: {time.perf_counter()-t0:.1f} s", flush=True)

    for n_it in (10, 20):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT,
                      W1p, b1v, WoutT8, boutA, n_it, 0.01, 1e-4, 1e-3)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(
            f"kernel n_iters={n_it}: {min(ts)*1e3:.2f} ms "
            f"({min(ts)*1e3/n_it:.3f} ms/iter)", flush=True,
        )
    print("finite:", bool(jnp.isfinite(out[0]).all()), flush=True)


if __name__ == "__main__":
    main()
