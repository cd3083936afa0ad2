#!/usr/bin/env python3
"""TPU-vs-CPU parity for the full cached-mapping optimization step and the
cached IESEKF update — the two round-2 fast paths that regressed the TPU
bench ATE while staying accurate on CPU."""

import numpy as np
import jax
import jax.numpy as jnp


def build_world(backend):
    with jax.default_device(jax.devices(backend)[0]):
        from clid_slam_tpu.models import decoder as dec
        from clid_slam_tpu.models import neural_map as nm
        from clid_slam_tpu.mapping import pool as pl
        from clid_slam_tpu.ops.voxel import neighbor_offsets

        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, (60000, 3)).astype(np.float32)
        state = nm.init_map(1 << 17, 1 << 19, 8)
        td = jnp.zeros((16,), jnp.float32)
        state, _ = nm.insert_points.__wrapped__(
            state, jnp.asarray(pts), jnp.ones((60000,), bool), 0.4, td, 0,
            1e9, downsample=True,
        )
        feats = 0.05 * rng.normal(size=(1 << 17) + 1).astype(np.float32)
        feats = np.repeat(feats[:, None], 8, 1) + 0.01 * rng.normal(
            size=((1 << 17) + 1, 8)
        ).astype(np.float32)
        state = state._replace(geo_feats=jnp.asarray(feats))
        mlp = dec.init_mlp(jax.random.PRNGKey(0), 8 + 3, 64, 1, 1)
        pool = pl.init_pool(1 << 18, 1 << 14, 1)
        m = 1 << 17
        coords = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
        sdfs = rng.normal(0, 0.1, m).astype(np.float32)
        pool = pl.append_samples(
            pool, jnp.asarray(coords), jnp.asarray(sdfs),
            jnp.ones((m,), jnp.float32), jnp.ones((m,), bool), 0,
            jnp.zeros((m,), bool), key=jax.random.PRNGKey(9),
        )
        nb = neighbor_offsets(2, 0.5)
        return state, mlp, pool, nb, td


def run_mapping(backend, iters=10):
    with jax.default_device(jax.devices(backend)[0]):
        from clid_slam_tpu.mapping import mapper as mp
        from clid_slam_tpu.models import decoder as dec

        state, mlp, pool, nb, td = build_world(backend)
        color_mlp = dec.init_mlp(jax.random.PRNGKey(2), 11, 64, 1, 1)
        sem_mlp = dec.init_mlp(jax.random.PRNGKey(3), 11, 64, 1, 1)
        fn = mp.make_mapping_fn(
            feature_dim=8, knn_k=6, nb_offs=nb, resolution=0.4,
            max_valid_dist2=3.0 * (3 * 0.4) ** 2, sdf_scale=0.1, sigma=0.1,
            bs=16384, bs_new=0, gradient_decimation=10, num_grad_eps=0.04,
            weight_e=0.5, loss_weight_on=True, lr=0.01, adam_eps=1e-15,
            as_body=True,
        )
        st2, mlp2, _, _, losses = fn(
            state, mlp, color_mlp, sem_mlp, pool, td, 0, 1e9,
            jax.random.PRNGKey(11), iters, 1.0,
        )
        return (
            np.asarray(st2.geo_feats),
            np.asarray(mlp2.w_out),
            np.asarray(losses),
            np.asarray(st2.certainty),
        )


def run_cached_update(backend):
    with jax.default_device(jax.devices(backend)[0]):
        from clid_slam_tpu.odometry import iekf

        state, mlp, pool, nb, td = build_world(backend)
        rng = np.random.default_rng(4)
        src = rng.uniform(-15, 15, (4096, 3)).astype(np.float32)
        upd = iekf.make_cached_update_fn(
            knn_k=6, n_cand=16, nb_offs=nb, resolution=0.4,
            max_valid_dist2=3.0 * (3 * 0.4) ** 2, sdf_scale=0.1,
            min_grad_norm=0.0, max_grad_norm=1e9, min_nn_count=1,
            max_iteration=12, term_thre_deg=1e-9, term_thre_m=1e-9,
        )
        rot, pos, rest, P, ok, it = upd(
            state, mlp, jnp.asarray(src), jnp.ones((4096,), bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros(12, jnp.float32), jnp.eye(18, dtype=jnp.float32),
            td, 0, 1e9,
        )
        return np.asarray(rot), np.asarray(pos), int(it), bool(ok)


def main():
    backends = ["cpu"]
    for cand in ("axon", "tpu"):
        try:
            jax.devices(cand)
            backends.append(cand)
            break
        except Exception:
            pass

    res = {b: run_mapping(b) for b in backends}
    f_c, w_c, l_c, c_c = res["cpu"]
    print(f"mapping cpu: losses={l_c}")
    for b in backends[1:]:
        f_b, w_b, l_b, c_b = res[b]
        print(f"mapping {b}: losses={l_b}")
        df = np.abs(f_c - f_b)
        print(
            f"  geo_feats: max|Δ| {df.max():.3e} mean {df.mean():.3e} "
            f"(feat scale {np.abs(f_c).max():.3f})"
        )
        print(f"  mlp w_out max|Δ| {np.abs(w_c - w_b).max():.3e}")
        print(f"  certainty max|Δ| {np.abs(c_c - c_b).max():.3e}")

    upd = {b: run_cached_update(b) for b in backends}
    r_c, p_c, i_c, ok_c = upd["cpu"]
    print(f"cached_update cpu: it={i_c} ok={ok_c} pos={p_c}")
    for b in backends[1:]:
        r_b, p_b, i_b, ok_b = upd[b]
        print(f"cached_update {b}: it={i_b} ok={ok_b} pos={p_b}")
        print(
            f"  Δpos {np.linalg.norm(p_c - p_b):.3e} m   "
            f"Δrot {np.abs(r_c - r_b).max():.3e}"
        )


if __name__ == "__main__":
    main()
