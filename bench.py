#!/usr/bin/env python3
"""Benchmark: full SLAM loop (IMU + IESEKF tracking + neural mapping) on
synthetic LiDAR-inertial sequences at two scales, with a per-stage
device-time breakdown and an MFU estimate.

Prints ONE JSON line:
  {"metric": "scans_per_sec", "value": N, "unit": "scans/s",
   "vs_baseline": R, "extra": {...}}

- headline value = the validated small-scale run (25 frames, room world;
  accuracy compared against the unmodified reference engine on the same
  sequence). The LARGE-scale run (200 frames, 100 m hall, 1e5+ neural
  points, prune + window cadences firing) rides in extra["large"] for
  throughput-at-scale AND accuracy (r5: ATE 0.05-0.09 m across runs vs
  the reference engine's 0.132 m on the same 200-frame sequence, at
  ~92 ms/frame vs its 2.5 s/frame on CPU).
- vs_baseline is against the reference's real-time budget of 10 scans/s
  (100 ms/frame on an RTX 4090 — utils/tools.py:948, BASELINE.md).
- extra["reference_cpu*"]: the UNMODIFIED reference engine (torch, CPU,
  scripts/run_reference_cpu.py) on the identical sequences.
- extra["scaling"]: sharded mapping step over 1/2/4/8 virtual devices
  (subprocess, scripts/bench_scaling.py) + collective-traffic model.

Default path: the zero-readback streaming loop (pipeline/streaming.py).
Flags: --classic (host-driven loop), --small-only / --large-only,
--no-scaling, --no-stages.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
TOTAL_FRAMES = 232  # one static trajectory-shape bucket for both scales


def enable_compile_cache():
    """Persistent XLA compilation cache — importable side effect so every
    diagnostic script that `import bench` gets warm compiles too (the
    fused frame step takes 200+ s to compile cold on the tunnel TPU)."""
    os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


enable_compile_cache()


def build_config(large: bool = False):
    from clid_slam_tpu.config import Config

    cfg = Config()
    cfg.voxel_size_m = 0.4
    cfg.search_alpha = 0.5
    cfg.local_voxel_size_m = 0.2
    cfg.surface_sample_range_m = 0.25
    cfg.surface_sample_n = 4
    cfg.free_front_n = 2
    cfg.free_behind_n = 1
    cfg.vox_down_m = 0.1
    cfg.source_vox_down_m = 0.6
    cfg.min_range = 0.5
    cfg.max_range = 60.0
    cfg.bs = 16384
    cfg.bs_new_sample = 1000
    cfg.iters = 10
    cfg.init_iter_ratio = 40
    cfg.reg_iter_n = 50
    cfg.freeze_after_frame = 15
    cfg.loss_weight_on = True
    cfg.adaptive_iters = True
    # capacity right-sized to the benchmark scenes (large peaks at ~125k
    # neural points -> 2.1x headroom): the per-frame O(capacity) slab
    # passes (feature write-back etc.) shrink 4x — same-process A/B on
    # the large scenario: -6.5 ms/frame. The HASH stays at 1<<22: at
    # 1<<21 (6% load) the collision-eviction churn measurably corrupts
    # the map over 200 frames (ATE 0.052 -> 0.179 full-run A/B r5) —
    # collision rate is accuracy-critical, table size is not (the
    # reference uses 5e7 buckets for the same reason,
    # utils/config.py:121).
    cfg.map_capacity = 1 << 18
    cfg.map_hash_size = 1 << 22
    cfg.local_map_capacity = 1 << 19
    cfg.local_map_hash_size = 1 << 21
    cfg.max_scan_points = 1 << 15
    cfg.max_source_points = 1 << 13
    cfg.pool_capacity = 1 << 22 if large else 1 << 21
    # the sliding window moves slowly: filtering the pool every frame is
    # pure overhead (O(pool) compaction)
    cfg.pool_filter_freq = 10
    cfg.prune_map_on = large  # prune/rehash cadence fires at scale
    cfg.prune_freq_frame = 50
    if large:
        # honest sensor model: the synthetic IMU has EXACTLY zero bias and
        # zero bias random walk; the reference default (1e-4, tuned for
        # real MEMS parts) lets the bias state steal a sustained launch
        # acceleration when registration SNR is low (r4 diagnosis,
        # scripts/diag_large2.py: ba_x climbed to 0.35 m/s^2 of a real
        # 2.0 m/s^2 launch and velocity never built)
        cfg.bias_noise_covariance = 1e-8
        # registration trust calibrated to the measured map error field
        # (scripts/diag_large7/9.py): beyond ~20 m the SDF carries coherent
        # ~8 cm surface bias toward the sensor (single-ring support), and
        # the texture error is spatially correlated — feeding 60 m points
        # at the reference's hardcoded per-point info (1000) drags the
        # launch. Mapping still consumes the full 60 m cloud.
        cfg.track_max_range = 20.0
        cfg.tracker_info_scale = 30.0
    cfg.track_on = True
    cfg.silence = True
    cfg._derive()
    if not large:
        cfg.diff_travel_dist_local = 1e9
    return cfg


def make_sequence(large: bool, n_frames: int):
    from clid_slam_tpu.pipeline.synthetic import (
        SyntheticWorld, generate_sequence, large_world,
    )

    if large:
        rng = np.random.default_rng(11)
        world = large_world(rng, room_radius=50.0)
        # Boot profile measured against BOTH engines (r4,
        # scripts/diag_large*.py + run_reference_cpu.py --large):
        # - truly static hold (15 frames), then a FAST ramp (25 frames) to
        #   full speed: real sequences open with the operator standing
        #   still and then walk off; a 60-frame creep through mm-per-frame
        #   motions sits under the registration noise floor (±2 mm minimum
        #   texture) and bootstraps map corruption — the UNMODIFIED
        #   reference engine fails it identically (ATE 16.4 m / 100
        #   frames, terr trace bit-comparable to ours);
        # - spin_phase: a real spinning LiDAR never repeats the same
        #   azimuth grid; the bit-identical synthetic grid lets the SDF
        #   overfit exact sample positions.
        return generate_sequence(
            n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01,
            radius=32.0, period_frames=400.0, seed=3, world=world,
            ramp_frames=25.0, hold_frames=15.0, spin_phase=True,
        )
    return generate_sequence(
        n_frames=n_frames, n_azimuth=1024, n_elev=32, noise_std=0.01, seed=3
    )


def _vel0(seq, label):
    """Initial platform velocity: the large sequence ramps from rest
    (vel0 = 0 exactly); the small one starts at full speed on the circle,
    where the analytic tangent beats the secant (chord is ~9 deg off at
    0.94 m/frame and measurably worsens the chaotic trajectory)."""
    if label == "large":
        return (seq.poses[1][:3, 3] - seq.poses[0][:3, 3]) / 0.1
    w_rad_s = 2 * np.pi / (20.0 * 0.1)
    r = np.linalg.norm(seq.poses[0][:2, 3])
    return seq.poses[0][:3, :3] @ np.array([r * w_rad_s, 0, 0])


def run_streaming(cfg, seq, n_frames, warmup, label):
    import jax

    from clid_slam_tpu.pipeline.streaming import StreamingSlam
    from clid_slam_tpu.utils import metrics

    vel0 = _vel0(seq, label)

    system = StreamingSlam(cfg, total_frames=TOTAL_FRAMES)
    system.seed_pose(seq.poses[0][:3, :3], seq.poses[0][:3, 3], vel0)
    t0 = time.perf_counter()
    system.precompile()
    precompile_s = time.perf_counter() - t0
    print(f"# [{label}] precompile: {precompile_s:.1f} s", file=sys.stderr)
    for i in range(min(warmup, n_frames)):
        t0 = time.perf_counter()
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        system.block()
        print(
            f"# [{label}] frame {i}: "
            f"{(time.perf_counter()-t0)*1e3:.1f} ms",
            file=sys.stderr,
        )
    system.block()
    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        system.process_frame(i, seq.scans[i], seq.imu_windows[i])
    system.block()
    t1 = time.perf_counter()
    measured = max(n_frames - warmup, 1)
    med = (t1 - t0) / measured
    out = system.sync()
    est = out["odom_poses"][:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    print(
        f"# [{label}] steady: {measured} frames, {med*1e3:.1f} ms/frame, "
        f"ATE {m['ate_rmse_m']:.4f} m, points {out['neural_points']}",
        file=sys.stderr,
    )
    return {
        "scans_per_sec": round(1.0 / med, 3),
        "median_frame_ms": round(med * 1e3, 2),
        "ate_rmse_m": round(m["ate_rmse_m"], 4),
        "are_rmse_deg": round(m["are_rmse_deg"], 3),
        "neural_points": int(out["neural_points"]),
        "frames": n_frames,
        "precompile_s": round(precompile_s, 1),
    }, system


def run_classic(cfg, seq, n_frames, warmup, label):
    from clid_slam_tpu.pipeline.slam import SlamSystem
    from clid_slam_tpu.utils import metrics

    vel0 = _vel0(seq, label)
    system = SlamSystem(cfg, total_frames=TOTAL_FRAMES)
    system.tracker.x.pos = seq.poses[0][:3, 3].copy()
    system.tracker.x.rot = seq.poses[0][:3, :3].copy()
    system.tracker.x.vel = vel0
    times = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        st = system.process_frame(i, seq.scans[i], seq.imu_windows[i])
        t1 = time.perf_counter()
        if i >= warmup:
            times.append(t1 - t0)
        print(
            f"# [{label}/classic] frame {i}: {(t1-t0)*1e3:.1f} ms "
            f"(track {st.timings.get('tracking',0)*1e3:.1f}, "
            f"prep {st.timings.get('map_prep',0)*1e3:.1f}, "
            f"opt {st.timings.get('map_opt',0)*1e3:.1f})",
            file=sys.stderr,
        )
    med = float(np.median(times)) if times else 0.0
    est = system.dataset.odom_poses[:n_frames]
    m = metrics.absolute_error(est, seq.poses[:n_frames], align=False)
    return {
        "scans_per_sec": round(1.0 / med, 3) if med else 0.0,
        "median_frame_ms": round(med * 1e3, 2),
        "ate_rmse_m": round(m["ate_rmse_m"], 4),
        "neural_points": int(system.map_state.count),
        "frames": n_frames,
    }, system


def stage_breakdown(system, seq, label):
    """Device-time split of the fused frame: time the tracking / prep /
    mapping bodies as standalone executables on the steady-state system
    snapshot. Each standalone call carries one dispatch (~20 ms on the
    tunneled runtime); the deltas between configurations isolate it."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from clid_slam_tpu.mapping import mapper as mp
    from clid_slam_tpu.mapping import prep as prp
    from clid_slam_tpu.odometry import iekf
    from clid_slam_tpu.ops.voxel import voxel_down_sample_mask

    cfg = system.cfg
    st = system.state
    fid = jnp.asarray(system.processed - 1, jnp.int32)
    window = cfg.diff_travel_dist_local
    mvd2 = 3.0 * ((cfg.num_nei_cells + 1) * cfg.voxel_size_m) ** 2

    def timeit(fn, *args, n=8):
        r = fn(*args)
        jax.block_until_ready(jax.tree.leaves(r)[0])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(*args)
            jax.block_until_ready(jax.tree.leaves(r)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    # trivial call measures pure dispatch
    f_nop = jax.jit(lambda x: x + 1.0)
    t_dispatch = timeit(f_nop, jnp.zeros((8,), jnp.float32))

    pts = seq.scans[-1]
    buf = np.zeros((cfg.max_scan_points, 3), np.float32)
    n = min(len(pts), cfg.max_scan_points)
    buf[:n] = pts[:n, :3]
    points = jnp.asarray(buf)
    pmask = jnp.arange(cfg.max_scan_points) < n
    pose = st.odom_poses[system.processed - 1]

    @jax.jit
    def f_source(points, pmask):
        tm = voxel_down_sample_mask(
            points, pmask, cfg.vox_down_m, cfg.map_hash_size
        )
        sm = voxel_down_sample_mask(
            points, tm, cfg.source_vox_down_m, cfg.map_hash_size
        )
        n_src = jnp.sum(sm.astype(jnp.int32))
        (si,) = jnp.nonzero(sm, size=cfg.max_source_points, fill_value=0)
        return tm, points[si], jnp.arange(cfg.max_source_points) < n_src

    train_mask, src_pts, smask = f_source(points, pmask)

    upd = jax.jit(iekf.make_cached_update_fn(
        knn_k=cfg.query_nn_k,
        n_cand=cfg.track_n_cand or max(16, cfg.query_nn_k * 2),
        nb_offs=system.nb_offs, resolution=cfg.voxel_size_m,
        max_valid_dist2=mvd2, sdf_scale=cfg.sdf_scale,
        min_grad_norm=cfg.reg_min_grad_norm,
        max_grad_norm=cfg.reg_max_grad_norm,
        min_nn_count=cfg.track_mask_query_nn_k,
        max_iteration=cfg.reg_iter_n,
        term_thre_deg=cfg.reg_term_thre_deg,
        term_thre_m=cfg.reg_term_thre_m,
        encode_vecs=system.encode_vecs,
        weighted_first=cfg.weighted_first,
        layer_norm=cfg.layer_norm_on,
        max_sdf_std=cfg.surface_sample_range_m * cfg.max_sdf_std_ratio,
        stagnation_iter=cfg.stagnation_iter,
    ))
    t_track = timeit(
        upd, st.map_state, st.mlp, src_pts, smask, st.rot, st.pos,
        st.rest, st.P, st.travel_dist, fid, window,
    )

    prep = prp.make_prep_fn(
        resolution=cfg.voxel_size_m,
        local_resolution=cfg.local_voxel_size_m,
        local_map_size=cfg.local_map_size,
        window_radius=cfg.window_radius,
        surface_sample_range_m=cfg.surface_sample_range_m,
        surface_sample_n=cfg.surface_sample_n,
        free_front_n=cfg.free_front_n,
        free_behind_n=cfg.free_behind_n,
        free_sample_begin_ratio=cfg.free_sample_begin_ratio,
        free_sample_end_dist_m=cfg.free_sample_end_dist_m,
        max_range=cfg.max_range,
        dist_weight_on=cfg.dist_weight_on,
        dist_weight_scale=cfg.dist_weight_scale,
        map_surface_ratio=cfg.map_surface_ratio,
        from_sample_points=cfg.from_sample_points,
        new_certainty_thre=cfg.new_certainty_thre,
        novelty_on=cfg.bs_new_sample > 0,
        filter_pool_now=False,
    )
    key = jax.random.PRNGKey(0)
    t_prep = timeit(
        lambda: prep(
            *(jax.tree.map(jnp.copy, (st.map_state, st.local_map, st.pool))),
            key, points, train_mask, pose, st.travel_dist, fid, window,
            None, None,
        )
    )

    mapping_fn = mp.make_mapping_fn(
        feature_dim=cfg.feature_dim, knn_k=cfg.query_nn_k,
        nb_offs=system.nb_offs, resolution=cfg.voxel_size_m,
        max_valid_dist2=mvd2, sdf_scale=cfg.sdf_scale, sigma=cfg.sdf_scale,
        bs=cfg.bs, bs_new=cfg.bs_new_sample,
        gradient_decimation=cfg.gradient_decimation,
        num_grad_eps=cfg.num_grad_eps, weight_e=cfg.weight_e,
        loss_weight_on=cfg.loss_weight_on, lr=cfg.lr,
        adam_eps=cfg.adam_eps, encode_vecs=system.encode_vecs,
        weighted_first=cfg.weighted_first, layer_norm=cfg.layer_norm_on,
        resample_every=cfg.map_resample_every,
    )
    t_map = timeit(
        lambda: mapping_fn(
            jax.tree.map(jnp.copy, st.map_state), st.mlp, st.color_mlp,
            st.sem_mlp, st.pool, st.travel_dist, fid, window, key,
            jnp.asarray(cfg.iters, jnp.int32), jnp.asarray(1.0, jnp.float32),
        )
    )
    return {
        "dispatch_ms": round(t_dispatch, 2),
        "tracking_ms": round(t_track, 2),
        "prep_ms": round(t_prep, 2),
        "mapping_ms": round(t_map, 2),
        "note": (
            "standalone executables on the steady-state snapshot; each "
            "carries one dispatch (dispatch_ms); the production path "
            "fuses all three into one call"
        ),
    }


def hbm_estimate(cfg, frame_ms, n_cells, n_local_cells=7):
    """Modeled HBM bytes touched per steady frame vs the chip's peak BW.

    The workload is gather/scatter-bound (mfu_estimate note), so the
    meaningful utilization number is bandwidth, not FLOPs (VERDICT r4
    item 8). Counts the dominant random-access streams — hash-mirror
    probes, feature/slab gathers + write-backs, pool append — from the
    static shapes; sequential streams (pool filter, local-map crop) are
    amortized over their cadence. A bytes MODEL over measured wall time:
    real achieved bandwidth is higher to the extent random rows waste
    their 32B+ HBM burst (the model counts useful bytes only), so treat
    util as a lower bound on how busy the HBM actually is."""
    P = cfg.max_scan_points
    S_all = cfg.all_sample_n  # samples per scan point
    bs, k = cfg.bs, cfg.query_nn_k
    row = 16  # hash_mirror AoS row bytes
    probes = (
        bs * n_cells * row  # mapping cache build probe
        + cfg.max_source_points * n_cells * row  # tracking candidates
        + cfg.surface_sample_n * P * n_local_cells * row  # region labels
        + (1 + cfg.surface_sample_n) * P * row  # insert probe (1 cell)
        + S_all * P * 8  # own-cell novelty: ht idx + certainty gathers
    )
    feature_io = (
        cfg.max_source_points * 16 * (cfg.feature_dim + 3) * 4  # n_cand
        + 3 * bs * k * cfg.feature_dim * 4  # slab gather + mean writeback
    )
    pool_row = 48
    pool_io = (
        S_all * P * pool_row  # append write
        + bs * pool_row  # batch row gather
        + cfg.pool_capacity * pool_row / max(cfg.pool_filter_freq, 1)
    )
    total = probes + feature_io + pool_io
    peak = 819e9  # v5e HBM2 bandwidth
    achieved = total / (frame_ms * 1e-3)
    return {
        "modeled_gb_per_frame": round(total / 1e9, 3),
        "achieved_gbps_model": round(achieved / 1e9, 2),
        "hbm_util_pct": round(100.0 * achieved / peak, 2),
        "note": "useful-bytes model over measured wall time; random "
        "16B rows burn >=32B bursts, so true HBM occupancy is higher",
    }


def mfu_estimate(cfg, frame_ms):
    """Useful-FLOP model of one steady frame vs the chip's peak.

    Counts only MXU-shaped work (decoder matmuls over the mapping batch,
    taps, and tracking iterations). The workload is gather/scatter-bound
    by design — MFU is reported to make that explicit, not to flatter."""
    d_in = cfg.feature_dim + cfg.position_dim
    h = cfg.geo_mlp_hidden_dim
    mlp_flops = 2 * (d_in * h + h)  # fwd MACs*2 per sample
    per_iter = cfg.bs * mlp_flops * 3  # fwd+bwd ~3x fwd
    taps = 6 * (cfg.bs // cfg.gradient_decimation) * mlp_flops * 3
    mapping = cfg.iters * (per_iter + taps)
    tracking = 10 * cfg.max_source_points * mlp_flops * 3  # ~10 iters
    total = mapping + tracking
    peak = 197e12 / 2  # v5e bf16 peak / 2 for f32-precision matmuls
    return {
        "useful_flops_per_frame": int(total),
        "mfu_pct": round(100.0 * total / (frame_ms * 1e-3) / peak, 4),
        "note": "gather-bound workload; MXU work is a tiny fraction",
    }


def main():
    enable_compile_cache()
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    classic = "--classic" in sys.argv
    small_only = "--small-only" in sys.argv
    large_only = "--large-only" in sys.argv
    no_scaling = "--no-scaling" in sys.argv
    no_stages = "--no-stages" in sys.argv

    extra = {
        "device": str(jax.devices()[0]),
        "mode": "classic" if classic else "streaming",
    }

    runner = run_classic if classic else run_streaming

    if not large_only:
        n_small = int(args[0]) if args else 25
        cfg = build_config(large=False)
        seq = make_sequence(False, n_small)
        extra["small"], _ = runner(cfg, seq, n_small, 10, "small")
        extra["small"]["reference_cpu"] = {
            "ate_rmse_m_mean3seed": 0.1178,
            "ate_rmse_m_seeds": [0.1195, 0.1413, 0.0926],
            "median_frame_ms": 3091.0,
            "harness": "scripts/run_reference_cpu.py --frames 25",
            "recorded": "r4 measurement (2026-08); re-run the harness if "
            "the scenario, seeds, or reference wrapper change",
        }

    if not small_only:
        n_large = 200
        cfg = build_config(large=True)
        seq = make_sequence(True, n_large)
        extra["large"], system = runner(cfg, seq, n_large, 10, "large")
        if not no_stages and not classic:
            try:
                extra["large"]["stage_breakdown"] = stage_breakdown(
                    system, seq, "large"
                )
            except Exception as e:  # breakdown is best-effort telemetry
                extra["large"]["stage_breakdown"] = {"error": str(e)[:200]}
        extra["large"]["mfu"] = mfu_estimate(
            cfg, extra["large"]["median_frame_ms"]
        )
        from clid_slam_tpu.ops.voxel import neighbor_offsets

        extra["large"]["hbm"] = hbm_estimate(
            cfg, extra["large"]["median_frame_ms"],
            neighbor_offsets(cfg.num_nei_cells, cfg.search_alpha).shape[0],
        )
        # r4: the r3 "known issue" is closed -- the r3 scenario defeated
        # the UNMODIFIED reference engine identically (scenario property:
        # sub-noise-floor creep + repeated ray grid + gauge symmetry, see
        # STATUS.md r4); on the corrected scenario both engines track.
        extra["large"]["reference_cpu"] = {
            "ate_rmse_m": 0.132,
            "are_rmse_deg": 0.2167,
            "median_frame_ms": 2528.43,
            "neural_points": 121093,
            "harness": "scripts/run_reference_cpu.py --large --frames 200",
            "recorded": "r4 measurement (2026-08); re-run the harness if "
            "the scenario, seeds, or reference wrapper change",
        }
    head = extra.get("small") or extra["large"]

    if not no_scaling:
        try:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip()
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts/bench_scaling.py")],
                capture_output=True, text=True, timeout=1200, env=env,
            )
            extra["scaling"] = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception as e:
            extra["scaling"] = {"error": str(e)[:200]}

    fps = head["scans_per_sec"]
    # full detail (stage notes, harness strings, per-device scaling rows)
    # goes to a sidecar; the stdout line stays compact so the driver's
    # tail-capture can always parse it (r4: the kilobytes-long line was
    # recorded with parsed=null)
    detail_path = os.path.join(REPO, "bench_detail.json")
    with open(detail_path, "w") as f:
        json.dump(extra, f, indent=1)

    def _pick(d, keys):
        return {k: d[k] for k in keys if isinstance(d, dict) and k in d}

    compact = {}
    for scale in ("small", "large"):
        if scale in extra:
            compact[scale] = _pick(
                extra[scale],
                ("scans_per_sec", "median_frame_ms", "ate_rmse_m",
                 "neural_points"),
            )
            ref = extra[scale].get("reference_cpu", {})
            compact[scale]["ref_ate_m"] = ref.get(
                "ate_rmse_m", ref.get("ate_rmse_m_mean3seed")
            )
    sc = extra.get("scaling", {})
    if isinstance(sc.get("scaling"), dict):
        compact["scaling_eff"] = {
            k: v.get("efficiency_vs_1dev") for k, v in sc["scaling"].items()
        }
        if "efficiency_median_of" in sc:
            compact["scaling_runs"] = sc["efficiency_median_of"]
    if "hbm" in extra.get("large", {}):
        compact["hbm_util_pct"] = extra["large"]["hbm"].get("hbm_util_pct")
    compact["detail"] = "bench_detail.json"
    print(
        json.dumps(
            {
                "metric": "scans_per_sec",
                "value": fps,
                "unit": "scans/s",
                "vs_baseline": round(fps / 10.0, 3),
                "extra": compact,
            }
        )
    )


if __name__ == "__main__":
    main()
