#!/usr/bin/env python3
"""TPU-vs-CPU parity check for the ops touched by the round-2 prep
optimizations: insert_points (staged compaction scatters), pool append
(eviction), local-map mirror labels, and the cached-mapping batch cache.
Any op whose TPU output diverges from its CPU output is a miscompile or a
TPU-numerics hazard."""

import numpy as np
import jax
import jax.numpy as jnp


def run_insert(backend, pts, mask, n_repeats=3):
    with jax.default_device(jax.devices(backend)[0]):
        from clid_slam_tpu.models import neural_map as nm

        state = nm.init_map(1 << 16, 1 << 18, 8)
        td = jnp.zeros((16,), jnp.float32)
        for r in range(n_repeats):
            state, ratio = nm.insert_points.__wrapped__(
                state,
                jnp.asarray(pts + 0.05 * r),
                jnp.asarray(mask),
                0.4,
                td,
                r,
                1e9,
                downsample=True,
            )
        return {
            "count": int(state.count),
            "positions": np.asarray(state.positions),
            "hash_nonempty": int(np.sum(np.asarray(state.hash_table) >= 0)),
            "ratio": float(ratio),
        }


def run_labels(backend, pts, q):
    with jax.default_device(jax.devices(backend)[0]):
        from clid_slam_tpu.models import local_map as lm

        st = lm.init_local_map(1 << 15, 1 << 17)
        st = lm.update_local_map.__wrapped__(
            st, jnp.zeros(3), jnp.asarray(pts), jnp.ones(len(pts), bool),
            0.2, 100.0, crop_now=True,
        )
        sdf, smask = lm.region_specific_sdf(st, jnp.asarray(q), 0.2)
        return np.asarray(sdf), np.asarray(smask)


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (32768, 3)).astype(np.float32)
    mask = rng.random(32768) < 0.9
    backends = ["cpu"]
    try:
        jax.devices("axon")
        backends.append("axon")
    except Exception:
        try:
            jax.devices("tpu")
            backends.append("tpu")
        except Exception:
            print("no TPU backend; cpu-only run (nothing to compare)")

    res = {b: run_insert(b, pts, mask) for b in backends}
    cpu = res["cpu"]
    print(f"insert cpu: count={cpu['count']} hash={cpu['hash_nonempty']}")
    for b in backends[1:]:
        r = res[b]
        print(f"insert {b}: count={r['count']} hash={r['hash_nonempty']}")
        same_count = r["count"] == cpu["count"]
        # positions may be permuted only if winners raced; compare as sets
        pc = np.sort(cpu["positions"][: cpu["count"]], axis=0)
        pb = np.sort(r["positions"][: r["count"]], axis=0)
        pos_ok = same_count and np.allclose(pc, pb, atol=1e-5)
        print(f"  count match: {same_count}  positions set-match: {pos_ok}")
        if not pos_ok and same_count:
            d = np.abs(pc - pb).max()
            print(f"  max sorted-position delta: {d}")

    q = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
    lab = {b: run_labels(b, pts[:8192], q) for b in backends}
    for b in backends[1:]:
        s_c, m_c = lab["cpu"]
        s_b, m_b = lab[b]
        mm = np.mean(m_c == m_b)
        both = m_c & m_b
        sd = np.abs(s_c[both] - s_b[both]).max() if both.any() else 0.0
        print(f"labels {b}: mask agree {mm*100:.2f}%  max |Δsdf| {sd:.2e}")


if __name__ == "__main__":
    main()
