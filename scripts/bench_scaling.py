#!/usr/bin/env python3
"""Scaling-efficiency benchmark of the sharded mapping step over
1/2/4/8 virtual CPU devices — the stand-in for the >=75% 1->2-host
north star (no multi-chip hardware in this environment; the mesh,
shardings, and collectives are identical on a real pod, only the
interconnect differs).

r5 methodology (VERDICT r4 item 4 — reconcile the artifact with the
claims; this output is the SINGLE source of truth):

- the whole sweep repeats R times interleaved; per device count we report
  the median step and the spread (the r4 disagreement traced to
  single-shot numbers on a 2-core box under load);
- the virtual CPU mesh TIMESHARES all shards on the same cores, so
  step_ms measures TOTAL WORK, not wall-clock: efficiency_vs_1dev =
  t1/tS is a structural LOWER BOUND, not pod efficiency;
- per-shard work decomposition: with hash-based map ownership every
  shard probes the FULL batch against its own table (replicated work
  w_rep), while MLP/losses are chunk-sharded (total w_chunk). A linear
  fit t(S) = w_rep*S + w_chunk over the measured sweep separates the
  two; a real pod's per-shard wall-clock is w_rep + w_chunk/S + ICI, so
  projected_efficiency_pod = t1 / (S * (w_rep + w_chunk/S + t_ici))
  with t_ici from the collective-bytes model at 40 GB/s effective ICI.
  The fit residual is printed so the linearity claim is checkable.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=.:/root/.axon_site python scripts/bench_scaling.py
Prints one JSON line: {"scaling": {...}}.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from clid_slam_tpu.mapping import pool as pl
from clid_slam_tpu.models import decoder as dec
from clid_slam_tpu.ops.voxel import neighbor_offsets
from clid_slam_tpu.parallel import spatial as sp

RES = 0.3
F = 8
BS = 4096
ITERS = 10
REPEATS = 3
ICI_GBPS = 40.0  # effective per-hop ICI bandwidth, v5e-class


def setup_pool(rng, m=65536):
    pool = pl.init_pool(1 << 17, 512)
    return pl.append_samples(
        pool,
        jnp.asarray(rng.uniform(-8, 8, (m, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.1, m).astype(np.float32)),
        jnp.ones((m,), jnp.float32),
        jnp.ones((m,), bool),
        0,
        jnp.zeros((m,), bool),
    )


def main():
    rng = np.random.default_rng(0)
    nb = neighbor_offsets(2, 0.5)
    mvd2 = 3.0 * (3 * RES) ** 2
    mlp = dec.init_mlp(jax.random.PRNGKey(0), F + 3, 64, 1)
    pool = setup_pool(rng)
    pts = rng.uniform(-8, 8, size=(40000, 3)).astype(np.float32)
    travel = jnp.zeros((8,), jnp.float32)

    dev_counts = (1, 2, 4, 8)
    states = {}
    fns = {}
    for n_dev in dev_counts:
        mesh = sp.make_spatial_mesh(n_dev)
        insert_fn, _, mapping_fn = sp.make_spatial_fns(
            mesh, feature_dim=F, knn_k=6, nb_offs=nb, resolution=RES,
            max_valid_dist2=mvd2, sdf_scale=0.055, sigma=0.055, bs=BS,
            bs_new=0, gradient_decimation=8, num_grad_eps=RES * 0.2,
            weight_e=0.5, loss_weight_on=True, lr=0.01,
        )
        sstate = sp.init_sharded_map(mesh, 1 << 15, 1 << 17, F)
        sstate, _ = insert_fn(
            sstate, jnp.asarray(pts), jnp.ones((len(pts),), bool),
            travel, 0, 1e9,
        )
        fns[n_dev] = mapping_fn
        states[n_dev] = sstate
        # warmup/compile
        s2, _, losses = mapping_fn(
            jax.tree.map(jnp.copy, sstate), mlp, pool, travel, 0, 1e9,
            jax.random.PRNGKey(1), ITERS, 1.0,
        )
        jax.block_until_ready(losses)
        del s2

    # interleaved repeats: each sweep measures every S back-to-back so
    # slow-machine drift hits all device counts alike
    samples = {n: [] for n in dev_counts}
    for rep in range(REPEATS):
        for n_dev in dev_counts:
            ts = []
            for i in range(5):
                st = jax.tree.map(jnp.copy, states[n_dev])
                jax.block_until_ready(jax.tree.leaves(st)[0])
                t0 = time.perf_counter()
                st, _, losses = fns[n_dev](
                    st, mlp, pool, travel, 0, 1e9,
                    jax.random.PRNGKey(rep * 5 + i), ITERS, 1.0,
                )
                jax.block_until_ready(losses)
                ts.append(time.perf_counter() - t0)
                del st
            samples[n_dev].append(float(np.median(ts)))
            print(
                f"# rep {rep} {n_dev} dev: {np.median(ts)*1e3:.1f} ms",
                file=sys.stderr,
            )

    results = {}
    for n_dev in dev_counts:
        med = float(np.median(samples[n_dev]))
        results[str(n_dev)] = {
            "step_ms": round(med * 1e3, 2),
            "step_ms_spread": [
                round(min(samples[n_dev]) * 1e3, 2),
                round(max(samples[n_dev]) * 1e3, 2),
            ],
            "points": sp.total_count(states[n_dev]),
        }

    t1 = results["1"]["step_ms"]
    for k, v in results.items():
        v["efficiency_vs_1dev"] = round(t1 / v["step_ms"], 3)

    # ---- per-shard work decomposition: t(S) = w_rep*S + w_chunk
    S_arr = np.array(dev_counts, float)
    t_arr = np.array([results[str(s)]["step_ms"] for s in dev_counts])
    A = np.stack([S_arr, np.ones_like(S_arr)], axis=1)
    (w_rep, w_chunk), res_, *_ = np.linalg.lstsq(A, t_arr, rcond=None)
    fit_resid = float(np.sqrt(np.mean((A @ [w_rep, w_chunk] - t_arr) ** 2)))
    old_b, new_b = sp.collective_bytes_per_query(nb.shape[0], 6, F)
    coll_bytes_per_iter = BS * new_b  # per-iteration payload exchange
    t_ici_ms = ITERS * coll_bytes_per_iter / (ICI_GBPS * 1e9) * 1e3
    projected = {}
    for s in dev_counts:
        step_pod = max(w_rep, 0.0) + w_chunk / s + (t_ici_ms if s > 1 else 0)
        projected[str(s)] = round(t1 / (s * step_pod), 3) if s > 1 else 1.0

    out = {
        "scaling": results,
        "efficiency_median_of": REPEATS,
        "work_decomposition": {
            "w_rep_ms_per_shard": round(float(w_rep), 2),
            "w_chunk_ms_total": round(float(w_chunk), 2),
            "fit_residual_ms": round(fit_resid, 2),
            "model": "t_virtual(S) = w_rep*S + w_chunk (hash ownership "
            "replicates the probe on every shard; MLP/losses are "
            "chunk-sharded)",
        },
        "projected_efficiency_pod": projected,
        "ici_model_ms_per_step": round(t_ici_ms, 3),
        "collective_bytes_per_query": {
            "r2_full_candidate_psum": old_b,
            "partial_knn_exchange": new_b,
            "reduction": round(old_b / new_b, 2),
        },
        "note": (
            "virtual CPU mesh: S virtual devices timeshare the SAME "
            "physical cores, so step_ms measures TOTAL work and "
            "efficiency_vs_1dev = t1/tS is a structural LOWER BOUND on "
            "pod efficiency. projected_efficiency_pod divides the fitted "
            "replicated (w_rep) and chunked (w_chunk) work per shard and "
            "adds the modeled ICI collective time; the fit residual "
            "makes the linearity claim checkable."
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
