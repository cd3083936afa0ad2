"""18-state Iterated Error-State EKF for LiDAR-inertial odometry.

Capabilities of the reference IEKFOM (utils/error_state_iekf.py:90-337):
state = [rot(3), pos(3), vel(3), bg(3), ba(3), grav(3)], IMU forward
propagation with F/Fw Jacobians, and an iterated measurement update whose
observations are per-point SDF values + SDF spatial gradients queried from
the neural map.

TPU-native split (reference runs predict on CPU float64 and the update's
18x18 algebra on GPU float64 — utils/error_state_iekf.py:158-165, 274-336):

- **Filter algebra on host, numpy float64.** The 18x18 covariance work is
  microseconds; float64 matters for conditioning and TPUs are f32-native.
- **Measurement model on device, one fused jitted reduction.** The expensive
  part — transform N points, query the neural map, decode SDF, get the SDF
  spatial gradient, gate validity, form per-point Jacobians and robust
  weights — never materializes H[N,18] on the host: the device reduces
  directly to S = Hᵀ R⁻¹ H (6x6 — H has zeros past column 6,
  utils/error_state_iekf.py:249-255) and b = Hᵀ R⁻¹ z, so each IESEKF
  iteration moves only ~50 floats across the host/device boundary.
- SDF gradients come from reverse-mode AD through the query+MLP
  (the reference uses torch autograd, utils/tools.py:298-311).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decoder as dec
from ..models import neural_map as nm

G_M_S2 = 9.81


# ------------------------------------------------------- host float64 SO(3)


def _skew(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def _so3_exp(w):
    th = np.linalg.norm(w)
    if th < 1e-10:
        return np.eye(3)
    a = w / th
    K = _skew(a)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _so3_log(R):
    tr = np.trace(R)
    ct = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(ct)
    w = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]], dtype=np.float64
    )
    if abs(th) < 1e-4:
        scale = 0.5 + th * th / 12.0
    else:
        scale = 0.5 * th / (np.sin(th) + 1e-12)
    return scale * w


@dataclass
class IEKFConfig:
    measurement_noise_covariance: float = 0.01
    bias_noise_covariance: float = 0.0001
    max_iteration: int = 50
    term_thre_deg: float = 0.01
    term_thre_m: float = 0.001
    eps: float = 0.001
    min_valid_ratio: float = 0.2


@dataclass
class IEKFState:
    """Nominal state; error-state covariance P."""

    rot: np.ndarray = field(default_factory=lambda: np.eye(3))
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    vel: np.ndarray = field(default_factory=lambda: np.zeros(3))
    bg: np.ndarray = field(default_factory=lambda: np.zeros(3))
    ba: np.ndarray = field(default_factory=lambda: np.zeros(3))
    grav: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, -G_M_S2]))

    def boxplus(self, dx: np.ndarray) -> "IEKFState":
        return IEKFState(
            rot=self.rot @ _so3_exp(dx[0:3]),
            pos=self.pos + dx[3:6],
            vel=self.vel + dx[6:9],
            bg=self.bg + dx[9:12],
            ba=self.ba + dx[12:15],
            grav=self.grav + dx[15:18],
        )

    def boxminus(self, other: "IEKFState") -> np.ndarray:
        return np.concatenate(
            [
                _so3_log(other.rot.T @ self.rot),
                self.pos - other.pos,
                self.vel - other.vel,
                self.bg - other.bg,
                self.ba - other.ba,
                self.grav - other.grav,
            ]
        )

    def pose_matrix(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.rot
        T[:3, 3] = self.pos
        return T


class IEKF:
    """Host-side filter. Mirrors utils/error_state_iekf.py:90-165 for the
    prediction step and :266-337 for the iterated update loop."""

    def __init__(self, cfg: IEKFConfig, init_bg=None, init_ba=None, init_grav=None):
        self.cfg = cfg
        self.x = IEKFState()
        if init_bg is not None:
            self.x.bg = np.asarray(init_bg, np.float64)
        if init_ba is not None:
            self.x.ba = np.asarray(init_ba, np.float64)
        if init_grav is not None:
            self.x.grav = np.asarray(init_grav, np.float64)
        P = np.eye(18)
        P[9:12, 9:12] *= 1e-4
        P[12:15, 12:15] *= 1e-3
        P[15:18, 15:18] *= 1e-4
        self.P = P
        Q = np.zeros((12, 12))
        Q[0:3, 0:3] = cfg.measurement_noise_covariance * np.eye(3)
        Q[3:6, 3:6] = cfg.measurement_noise_covariance * np.eye(3)
        Q[6:9, 6:9] = cfg.bias_noise_covariance * np.eye(3)
        Q[9:12, 9:12] = cfg.bias_noise_covariance * np.eye(3)
        self.Q = Q

    # ------------------------------------------------------------ predict
    def predict(self, acc: np.ndarray, gyro: np.ndarray, dt: float):
        x = self.x
        acc = np.asarray(acc, np.float64)
        gyro = np.asarray(gyro, np.float64)
        # motion model f (utils/error_state_iekf.py:167-174)
        f = np.zeros(18)
        f[0:3] = gyro - x.bg
        f[3:6] = x.vel
        f[6:9] = x.rot @ (acc - x.ba) + x.grav
        # F = df/dx (:126-141), with the reference's small-angle shortcuts
        F = np.eye(18)
        I_dt = np.eye(3) * dt
        F[0:3, 9:12] = -I_dt
        F[3:6, 6:9] = I_dt
        F[6:9, 0:3] = -x.rot @ _skew(acc - x.ba) * dt
        F[6:9, 12:15] = -x.rot * dt
        F[6:9, 15:18] = I_dt
        # Fw = df/dw (:143-156)
        Fw = np.zeros((18, 12))
        Fw[0:3, 0:3] = -np.eye(3)
        Fw[6:9, 3:6] = -x.rot
        Fw[9:12, 6:9] = np.eye(3)
        Fw[12:15, 9:12] = np.eye(3)
        Fw *= dt

        self.x = x.boxplus(f * dt)
        P = F @ self.P @ F.T + Fw @ self.Q @ Fw.T
        self.P = 0.5 * (P + P.T)  # keep P exactly symmetric

    # ---------------------------------------------------- iterated update
    def update_iterated(
        self,
        h_reduce: Callable,
        points_imu,  # [N,3] device array, sensor/IMU frame
        mask,  # [N] device bool
        *h_args,
    ):
        """h_reduce(points_imu, mask, R_f32, t_f32, *h_args) ->
        (S6, b6, n_valid, n_total) on device."""
        cfg = self.cfg
        x_propagated = self.x
        P_inv = np.linalg.inv(self.P)
        I = np.eye(18)
        valid_flag = True
        converged = False
        S18 = np.zeros((18, 18))
        KH = np.zeros((18, 18))
        A_inv = self.P.copy()

        for i in range(cfg.max_iteration):
            dx_new = self.x.boxminus(x_propagated)
            S6, b6, n_valid, n_total = h_reduce(
                points_imu,
                mask,
                jnp.asarray(self.x.rot, jnp.float32),
                jnp.asarray(self.x.pos, jnp.float32),
                *h_args,
            )
            S6 = np.asarray(S6, np.float64)
            b6 = np.asarray(b6, np.float64)
            n_valid = int(n_valid)
            n_total = max(int(n_total), 1)

            if (
                n_valid / n_total < cfg.min_valid_ratio
                and i == cfg.max_iteration - 1
            ):
                valid_flag = False

            S18[:] = 0.0
            S18[:6, :6] = S6
            b18 = np.zeros(18)
            b18[:6] = b6

            A_inv = np.linalg.inv(S18 + P_inv)
            KH = A_inv @ S18  # = K @ H
            dx = -(A_inv @ b18) + (KH - I) @ dx_new
            # trust region: a per-iteration step beyond the frame-level
            # catastrophic-failure bound (utils/slam_dataset.py:544-550) is
            # never legitimate — it means (S+P⁻¹) went near-singular; scale
            # the whole step back so the iteration stays in a sane basin
            step_cap = 10.0
            tran_raw = np.linalg.norm(dx[3:6])
            if tran_raw > step_cap:
                dx = dx * (step_cap / tran_raw)

            self.x = self.x.boxplus(dx)
            tran_m = np.linalg.norm(dx[3:6])
            rot_deg = np.linalg.norm(dx[0:3]) * 180.0 / np.pi
            if (
                rot_deg < cfg.term_thre_deg
                and tran_m < cfg.term_thre_m
                and np.all(np.abs(dx[6:]) < cfg.eps)
            ):
                converged = True
            if not valid_flag or converged:
                break

        # information-form covariance update: (I-KH)P == (S+P⁻¹)⁻¹ exactly,
        # but the right-hand form is symmetric-PSD by construction — the
        # product form loses definiteness in finite precision and a
        # non-PSD P eventually makes (S+P⁻¹) indefinite, exploding dx
        # (observed: 95 m iteration steps once P degraded)
        self.P = 0.5 * (A_inv + A_inv.T)
        return self.x.pose_matrix(), valid_flag


# ------------------------------------------------- device-side h reduction


def make_h_reduce_fn(
    *,
    knn_k: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    min_grad_norm: float,
    max_grad_norm: float,
    min_nn_count: int,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
    weighted_first: bool = True,
    layer_norm: bool = False,
    max_sdf_std: float = float("inf"),
    info_scale: float = 1000.0,
):
    """Build the fused measurement reduction
    (utils/error_state_iekf.py:176-264 without the H[N,18] materialization).

    ``weighted_first=False`` decodes each kNN neighbor feature separately
    and takes the IDW-weighted mean; the per-point weighted SDF std then
    gates validity at ``max_sdf_std``
    (utils/error_state_iekf.py:217-241).

    Returned callable:
      h_reduce(map_state, mlp, points_imu[N,3], mask[N], R[3,3], t[3],
               travel_dist, cur_ts, window)
        -> (S6[6,6], b6[6], n_valid, n_total)
    """

    @jax.jit
    def h_reduce(
        map_state: nm.NeuralMapState,
        mlp: dec.MLPParams,
        points_imu,
        mask,
        R,
        t,
        travel_dist,
        cur_ts,
        window,
    ):
        pc_map = points_imu @ R.T + t  # [N,3] world frame

        def sdf_sum(pts):
            q = nm.query_feature(
                map_state,
                pts,
                nb_offs,
                resolution,
                max_valid_dist2,
                knn_k,
                travel_dist,
                cur_ts,
                window,
                True,
                rotate_vecs=rotate_vecs,
                encode_vecs=encode_vecs,
                weighted_first=weighted_first,
                layer_norm=layer_norm,
            )
            pred = dec.sdf(
                mlp, q.feature, sdf_scale, leaky=mlp_leaky, bf16=mlp_bf16
            )
            if weighted_first:
                sdf_std = jnp.zeros(pts.shape[0])
            else:
                mean = jnp.sum(pred * q.weights, axis=1)  # [N]
                var = jnp.sum(q.weights * (pred - mean[:, None]) ** 2, axis=1)
                sdf_std = jnp.sqrt(jnp.maximum(var, 0.0))
                pred = mean
            return jnp.sum(pred), (pred, q.nn_count, sdf_std)

        grad, (sdf_pred, nn_count, sdf_std) = jax.grad(
            sdf_sum, has_aux=True
        )(pc_map)
        grad_norm = jnp.linalg.norm(grad, axis=-1)

        valid = (
            mask
            & (nn_count >= min_nn_count)
            & (grad_norm > min_grad_norm)
            & (grad_norm < max_grad_norm)
        )
        if not weighted_first:
            valid = valid & (sdf_std < max_sdf_std)
        vf = valid.astype(jnp.float32)

        # H rows (utils/error_state_iekf.py:249-255):
        #   H[:,0:3] = -gᵀ·R·[p_imu]×,  H[:,3:6] = gᵀ   (g = ∇sdf)
        # with u = Rᵀg:  -uᵀ[p]× = (p × u)ᵀ
        gR = grad @ R  # [N,3] = (Rᵀ g)ᵀ rows
        h_rot = jnp.cross(points_imu, gR, axis=-1)
        H = jnp.concatenate([h_rot, grad], axis=-1)  # [N,6]

        # robust per-point information weights (:257-262)
        w_grad = 1.0 / (1.0 + (grad_norm - 1.0) ** 2)
        w_res = 0.4 / (0.4 + sdf_pred**2)
        r_inv = info_scale * w_grad * w_res * vf

        hp = jax.lax.Precision.HIGHEST  # f32-exact reductions on TPU
        S6 = jnp.einsum("n,ni,nj->ij", r_inv, H, H, precision=hp)
        b6 = jnp.einsum("n,ni,n->i", r_inv, H, sdf_pred, precision=hp)
        return S6, b6, jnp.sum(vf), jnp.sum(mask.astype(jnp.float32))

    return h_reduce


def device_predict_imu(rot, pos, vel, bg, ba, grav, P, Q, imu_rows, imu_count):
    """IMU forward propagation on device, f32 (host-f64 semantics of
    utils/error_state_iekf.py:126-165). ``imu_rows`` is a fixed-size
    [K,7] (dt, acc, gyro) buffer; rows past ``imu_count`` are no-ops.

    TPU-native formulation: the reference (and the r2 version here) runs a
    sequential per-sample loop — 64 iterations of tiny 3x3/18x18 math,
    which is pure latency (13.7 ms/frame measured on the r3 trace). All
    three recurrences are (log-depth) scans instead:
    - orientation: exclusive prefix PRODUCT of the per-sample rotation
      increments exp((gyro-bg)·dt) via associative_scan on [K,3,3];
    - velocity/position: prefix SUMS of (R_i(acc_i-ba)+g)·dt and vel_i·dt;
    - covariance: P_{i+1} = F_i P_i F_iᵀ + G_i is affine in P; pairs
      (A,B) compose associatively as (A2A1, A2 B1 A2ᵀ + B2), so the final
      P is one associative_scan over [K,18,18] pairs.
    Everything is batched [K,...] VPU/MXU work in ~log2(K) levels; the
    f32 result differs from the sequential order only by rounding
    (validated against the host f64 filter in tests/test_iekf.py)."""
    K = imu_rows.shape[0]
    I3 = jnp.eye(3, dtype=jnp.float32)
    live = (jnp.arange(K) < imu_count).astype(jnp.float32)
    dt = imu_rows[:, 0] * live  # [K]; dt=0 => exact identity step
    acc = imu_rows[:, 1:4]
    gyro = imu_rows[:, 4:7]

    from ..utils import lie

    # --- orientation chain: R_i = R0 · dR_0 · ... · dR_{i-1}
    dR = lie.so3_exp((gyro - bg) * dt[:, None])  # [K,3,3]
    # inclusive prefix products M_i = dR_0 @ ... @ dR_i
    M_inc = jax.lax.associative_scan(jnp.matmul, dR)  # [K,3,3]
    # R used INSIDE step i is the pre-step orientation (exclusive prefix)
    R_pre = jnp.concatenate(
        [jnp.broadcast_to(I3, (1, 3, 3)), M_inc[:-1]], axis=0
    )
    R_pre = rot @ R_pre  # [K,3,3]
    rot_n = rot @ M_inc[-1]

    # --- velocity / position prefix sums
    a_c = acc - ba  # [K,3]
    f_vel = jnp.einsum("kij,kj->ki", R_pre, a_c) + grav  # [K,3]
    dvel = f_vel * dt[:, None]
    vel_pre = vel + jnp.concatenate(
        [jnp.zeros((1, 3), jnp.float32), jnp.cumsum(dvel, axis=0)[:-1]],
        axis=0,
    )  # vel entering step i
    vel_n = vel + jnp.sum(dvel, axis=0)
    pos_n = pos + jnp.sum(vel_pre * dt[:, None], axis=0)

    # --- covariance: batched F_i, G_i then one affine associative scan
    a_skew = jnp.zeros((K, 3, 3), jnp.float32)
    a_skew = a_skew.at[:, 0, 1].set(-a_c[:, 2]).at[:, 0, 2].set(a_c[:, 1])
    a_skew = a_skew.at[:, 1, 0].set(a_c[:, 2]).at[:, 1, 2].set(-a_c[:, 0])
    a_skew = a_skew.at[:, 2, 0].set(-a_c[:, 1]).at[:, 2, 1].set(a_c[:, 0])
    dtk = dt[:, None, None]
    F = jnp.broadcast_to(jnp.eye(18, dtype=jnp.float32), (K, 18, 18))
    F = F.at[:, 0:3, 9:12].set(-I3 * dtk)
    F = F.at[:, 3:6, 6:9].set(I3 * dtk)
    F = F.at[:, 6:9, 0:3].set(-(R_pre @ a_skew) * dtk)
    F = F.at[:, 6:9, 12:15].set(-R_pre * dtk)
    F = F.at[:, 6:9, 15:18].set(I3 * dtk)
    Fw = jnp.zeros((K, 18, 12), jnp.float32)
    Fw = Fw.at[:, 0:3, 0:3].set(-I3 * dtk)
    Fw = Fw.at[:, 6:9, 3:6].set(-R_pre * dtk)
    Fw = Fw.at[:, 9:12, 6:9].set(I3 * dtk)
    Fw = Fw.at[:, 12:15, 9:12].set(I3 * dtk)
    G = Fw @ Q.astype(jnp.float32) @ jnp.swapaxes(Fw, -1, -2)  # [K,18,18]

    def compose(x, y):
        # apply x first, then y: P -> Ay(Ax P Axᵀ + Bx)Ayᵀ + By
        Ax, Bx = x
        Ay, By = y
        return Ay @ Ax, Ay @ Bx @ jnp.swapaxes(Ay, -1, -2) + By

    A_tot, B_tot = jax.lax.associative_scan(compose, (F, G))
    A_last, B_last = A_tot[-1], B_tot[-1]
    P_n = A_last @ P @ A_last.T + B_last
    P_n = 0.5 * (P_n + P_n.T)  # keep P exactly symmetric
    return (rot_n, pos_n, vel_n, bg, ba, grav, P_n)


def make_cached_update_fn(
    *,
    knn_k: int,
    n_cand: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    min_grad_norm: float,
    max_grad_norm: float,
    min_nn_count: int,
    max_iteration: int,
    term_thre_deg: float,
    term_thre_m: float,
    eps: float = 0.001,
    min_valid_ratio: float = 0.2,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
    weighted_first: bool = True,
    layer_norm: bool = False,
    max_sdf_std: float = float("inf"),
    stagnation_iter: int = 10,
    info_scale: float = 1000.0,
):
    """Candidate-cached iterated IESEKF update (unjitted body).

    TPU-native redesign of the per-iteration re-query
    (utils/error_state_iekf.py:197-231 re-runs the full K-cell hash probe
    every iteration): the IESEKF pose increments are millimetric relative
    to the voxel size, so the kNN candidate set is FROZEN at the
    IMU-propagated pose — one hash probe + one feature gather per frame —
    and every iteration runs dense [S, n_cand] math (VPU/MXU only, zero
    gathers). ``n_cand`` > knn_k gives slack so the true kNN of the
    slightly-moved points stay inside the cached set.

    Returns body(map_state, mlp, points_imu[S,3], mask[S], rot0, pos0,
                 rest0[12], P, travel_dist, cur_ts, window)
      -> (rot, pos, rest, P_new, ok, n_iter)
    """
    from ..utils import lie

    term_rad = term_thre_deg * jnp.pi / 180.0

    def _equilibrated_solve(A, B):
        d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-20))
        Dinv = 1.0 / d
        An = A * Dinv[:, None] * Dinv[None, :]
        Bn = B * Dinv[:, None]
        Xn = jnp.linalg.solve(An, Bn)
        return Xn * Dinv[:, None]

    def build_candidates(
        map_state: nm.NeuralMapState,
        points_imu,
        rot0,
        pos0,
        travel_dist,
        cur_ts,
        window,
    ):
        """One probe + gather at the propagated pose. Returns
        (cand_pos [S,C,3], cand_feat [S,C,F], cvalid [S,C],
        cand_quat [S,C,4] | None)."""
        cap = nm.map_capacity(map_state)
        # the packed f32 take_along below is exact only for hash ids < 2^24
        # (f32 mantissa); map_hash_size is user-configurable (config.py:224)
        if map_state.hash_table.shape[0] > (1 << 24):
            raise ValueError(
                "cached tracker packs hash ids through f32; "
                f"map_hash_size {map_state.hash_table.shape[0]} > 2^24 "
                "would silently corrupt candidate gathers — use the "
                "uncached tracker (track_cached: false) or a smaller hash"
            )
        pc0 = points_imu @ rot0.T + pos0
        d2, h, pvalid, mir = nm.neighborhood_probe(
            map_state, pc0, nb_offs, resolution, max_valid_dist2,
            travel_dist, cur_ts, window, True,
        )
        d2s = jnp.where(pvalid, d2, 9e3)
        neg, sel = jax.lax.top_k(-d2s, n_cand)  # [S,n_cand] nearest cells
        # ONE packed take_along instead of three (h, valid via d2s, mir):
        # per-element minor-dim gathers are the slow path on TPU (r3
        # trace), and h < 2^22 is exact in f32
        packed = jnp.concatenate(
            [h.astype(jnp.float32)[..., None], mir[..., :3]], axis=-1
        )  # [S,K,4]
        psel = jnp.take_along_axis(packed, sel[..., None], axis=1)
        h_sel = psel[..., 0].astype(jnp.int32)
        cvalid = -neg < 9e3  # selected cells that passed the probe gate
        dup = (h_sel[:, :, None] == h_sel[:, None, :]) & (
            jnp.tri(n_cand, n_cand, -1, dtype=bool)[None]
        )
        cvalid = cvalid & ~jnp.any(dup, axis=-1)
        idx = map_state.hash_table[h_sel]
        cvalid = cvalid & (idx >= 0)
        safe = jnp.where(cvalid, idx, cap)
        cand_pos = psel[..., 1:4]
        cand_feat = map_state.geo_feats[safe]  # [S,n_cand,F]
        if layer_norm:
            mu = jnp.mean(cand_feat, axis=-1, keepdims=True)
            var = jnp.var(cand_feat, axis=-1, keepdims=True)
            cand_feat = (cand_feat - mu) * jax.lax.rsqrt(var + 1e-5)
        cand_feat = jnp.where(cvalid[..., None], cand_feat, 0.0)
        cand_quat = None
        if rotate_vecs:
            cand_quat = map_state.quats[safe] * jnp.array(
                [1.0, -1.0, -1.0, -1.0]
            )
        return cand_pos, cand_feat, cvalid, cand_quat

    def dense_update(
        candidates,  # (cand_pos, cand_feat, cvalid, cand_quat)
        mlp: dec.MLPParams,
        points_imu,
        mask,
        rot0,
        pos0,
        rest0,
        P,
    ):
        """The iterated update on a frozen candidate set: pure dense
        [S, n_cand] math, no map access — shared by the single-chip and
        sharded (replicated-iteration) trackers."""
        cand_pos, cand_feat, cvalid, cand_quat = candidates
        n_total = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

        # ---- dense per-iteration measurement reduction on the cache.
        # kNN selection by RANK MASK instead of top_k + take_along_axis:
        # per-element minor-dim gathers inside the while body hit a
        # ~1 GB/s serial emitter path (r3 trace: 15.6 ms/frame across
        # iekf.py:538-542), while the [S,C,C] compare + masked reduction
        # over all C=n_cand candidates is plain VPU work. The selected
        # set is identical to top_k's (ties broken by lower index).
        iot = jnp.arange(n_cand, dtype=jnp.int32)
        tie = iot[None, :] < iot[:, None]  # [C,C] j<i

        def h_reduce_cached(rot, pos):
            pc_map = points_imu @ rot.T + pos

            def sdf_sum(pc):
                vecs = pc[:, None, :] - cand_pos  # [S,C,3]
                cd2 = jnp.sum(vecs * vecs, axis=-1)
                valid = cvalid & (cd2 <= max_valid_dist2)
                nn_count = jnp.sum(valid.astype(jnp.int32), axis=-1)
                cd2s = jnp.where(valid, cd2, 9e3)
                cd2s_ng = jax.lax.stop_gradient(cd2s)
                before = (cd2s_ng[:, None, :] < cd2s_ng[:, :, None]) | (
                    (cd2s_ng[:, None, :] == cd2s_ng[:, :, None]) & tie[None]
                )  # [S,C,C]: candidate j strictly precedes i
                rank = jnp.sum(before.astype(jnp.int32), axis=-1)  # [S,C]
                kvalid = (rank < knn_k) & valid
                feats = cand_feat
                kvecs = vecs
                if rotate_vecs:
                    q = cand_quat
                    w_, u = q[..., :1], q[..., 1:]
                    uv = jnp.cross(u, kvecs)
                    kvecs = kvecs + 2.0 * (w_ * uv + jnp.cross(u, uv))
                if encode_vecs is not None:
                    kvecs = encode_vecs(kvecs)
                kvecs = jnp.where(kvalid[..., None], kvecs, 0.0)
                epsw = 1e-15
                w = 1.0 / (cd2 + epsw)
                w = jnp.where(kvalid, w, 0.0)
                w = jnp.where((nn_count == 0)[:, None], epsw, w)
                w = w / jnp.sum(w, axis=1, keepdims=True)
                w = jnp.where(kvalid, w, 0.0)
                feat_vec = jnp.concatenate([feats, kvecs], axis=-1)
                if weighted_first:
                    feature = jnp.sum(feat_vec * w[..., None], axis=1)
                    pred = dec.sdf(
                        mlp, feature, sdf_scale, leaky=mlp_leaky,
                        bf16=mlp_bf16,
                    )
                    sdf_std = jnp.zeros(pc.shape[0])
                else:
                    pred_k = dec.sdf(
                        mlp, feat_vec, sdf_scale, leaky=mlp_leaky,
                        bf16=mlp_bf16,
                    )
                    pred = jnp.sum(pred_k * w, axis=1)
                    var = jnp.sum(w * (pred_k - pred[:, None]) ** 2, axis=1)
                    sdf_std = jnp.sqrt(jnp.maximum(var, 0.0))
                return jnp.sum(pred), (pred, nn_count, sdf_std)

            grad, (sdf_pred, nn_count, sdf_std) = jax.grad(
                sdf_sum, has_aux=True
            )(pc_map)
            grad_norm = jnp.linalg.norm(grad, axis=-1)
            valid = (
                mask
                & (nn_count >= min_nn_count)
                & (grad_norm > min_grad_norm)
                & (grad_norm < max_grad_norm)
            )
            if not weighted_first:
                valid = valid & (sdf_std < max_sdf_std)
            vf = valid.astype(jnp.float32)
            gR = grad @ rot
            h_rot = jnp.cross(points_imu, gR, axis=-1)
            H = jnp.concatenate([h_rot, grad], axis=-1)
            w_grad = 1.0 / (1.0 + (grad_norm - 1.0) ** 2)
            w_res = 0.4 / (0.4 + sdf_pred**2)
            r_inv = info_scale * w_grad * w_res * vf
            hp = jax.lax.Precision.HIGHEST
            S6 = jnp.einsum("n,ni,nj->ij", r_inv, H, H, precision=hp)
            b6 = jnp.einsum("n,ni,n->i", r_inv, H, sdf_pred, precision=hp)
            return S6, b6, jnp.sum(vf)

        P_inv = _equilibrated_solve(P, jnp.eye(18, dtype=jnp.float32))
        I18 = jnp.eye(18, dtype=jnp.float32)

        def cond(carry):
            i, _, _, _, _, _, done, _, _ = carry
            return (i < max_iteration) & ~done

        def it_body(carry):
            i, rot, pos, rest, _, _, _, _, prev_step = carry
            drot = lie.so3_log(rot0.T @ rot)
            dx_new = jnp.concatenate([drot, pos - pos0, rest - rest0])
            S6, b6, n_valid = h_reduce_cached(rot, pos)
            S18 = jnp.zeros((18, 18), jnp.float32).at[:6, :6].set(S6)
            b18 = jnp.zeros((18,), jnp.float32).at[:6].set(b6)
            A = S18 + P_inv
            # [dx_solve | KH | A⁻¹] in one solve; A⁻¹ is the posterior
            # covariance in information form ((I-KH)P == (S+P⁻¹)⁻¹ exactly,
            # and the latter stays symmetric-PSD in f32)
            sol = _equilibrated_solve(
                A, jnp.concatenate([b18[:, None], S18, I18], axis=1)
            )
            KH = sol[:, 1:19]
            A_inv = sol[:, 19:]
            dx = -sol[:, 0] + (KH - I18) @ dx_new
            # trust region: steps beyond the frame-level failure bound are
            # solver blow-ups (near-singular A), never real motion
            tran_raw = jnp.linalg.norm(dx[3:6])
            dx = dx * jnp.minimum(1.0, 10.0 / jnp.maximum(tran_raw, 1e-12))
            rot = rot @ lie.so3_exp(dx[0:3])
            pos = pos + dx[3:6]
            rest = rest + dx[6:18]
            tran_m = jnp.linalg.norm(dx[3:6])
            rot_rad = jnp.linalg.norm(dx[0:3])
            converged = (
                (rot_rad < term_rad)
                & (tran_m < term_thre_m)
                & jnp.all(jnp.abs(dx[6:]) < eps)
            )
            step = rot_rad + tran_m
            stalled = (i >= stagnation_iter) & (step >= prev_step)
            low_valid = (n_valid / n_total < min_valid_ratio) & (
                i == max_iteration - 1
            )
            return (
                i + 1, rot, pos, rest, A_inv, n_valid,
                converged | low_valid | stalled, ~low_valid, step,
            )

        init = (
            jnp.zeros((), jnp.int32),
            rot0,
            pos0,
            rest0,
            P,
            jnp.zeros(()),
            jnp.zeros((), bool),
            jnp.ones((), bool),
            jnp.full((), jnp.inf),
        )
        i, rot, pos, rest, A_inv, n_valid, _, ok, _ = jax.lax.while_loop(
            cond, it_body, init
        )
        ok = ok & ~(
            (n_valid / n_total < min_valid_ratio) & (i == max_iteration)
        )
        P_new = 0.5 * (A_inv + A_inv.T)
        return rot, pos, rest, P_new, ok, i

    def body(
        map_state: nm.NeuralMapState,
        mlp: dec.MLPParams,
        points_imu,
        mask,
        rot0,
        pos0,
        rest0,
        P,
        travel_dist,
        cur_ts,
        window,
    ):
        cands = build_candidates(
            map_state, points_imu, rot0, pos0, travel_dist, cur_ts, window
        )
        return dense_update(
            cands, mlp, points_imu, mask, rot0, pos0, rest0, P
        )

    # exposed for the sharded tracker: candidates built collectively, the
    # dense iteration then runs replicated (parallel/slam_sharded.py)
    body.build_candidates = build_candidates
    body.dense_update = dense_update
    body.n_cand = n_cand
    return body


def make_update_iterated_fn(
    *,
    knn_k: int,
    nb_offs,
    resolution: float,
    max_valid_dist2: float,
    sdf_scale: float,
    min_grad_norm: float,
    max_grad_norm: float,
    min_nn_count: int,
    max_iteration: int,
    term_thre_deg: float,
    term_thre_m: float,
    eps: float = 0.001,
    min_valid_ratio: float = 0.2,
    mlp_leaky: bool = False,
    mlp_bf16: bool = False,
    rotate_vecs: bool = False,
    encode_vecs=None,
    weighted_first: bool = True,
    layer_norm: bool = False,
    max_sdf_std: float = float("inf"),
    stagnation_iter: int = 10,
    info_scale: float = 1000.0,
):
    """The ENTIRE iterated IESEKF update as one jitted device call.

    The host version loops h_reduce with one device round-trip per
    iteration (fine locally, latency-bound over links); this folds the
    ≤max_iteration loop into a lax.while_loop with an early-exit
    convergence predicate, mirroring utils/error_state_iekf.py:266-337.

    Numerics: the 18x18 solve runs in f32 with Jacobi equilibration —
    A' = D (S+P⁻¹) D with D = diag(A)^{-1/2} brings the mixed-unit system
    to unit diagonal before the solve, which keeps f32 well-conditioned
    (validated against the float64 host filter in tests).

    Returns (rot, pos, dx_rest, P_new, valid_flag, n_iter).
    """
    from ..utils import lie

    h_core = make_h_reduce_fn(
        knn_k=knn_k,
        nb_offs=nb_offs,
        resolution=resolution,
        max_valid_dist2=max_valid_dist2,
        sdf_scale=sdf_scale,
        min_grad_norm=min_grad_norm,
        max_grad_norm=max_grad_norm,
        min_nn_count=min_nn_count,
        mlp_leaky=mlp_leaky,
        mlp_bf16=mlp_bf16,
        rotate_vecs=rotate_vecs,
        encode_vecs=encode_vecs,
        weighted_first=weighted_first,
        layer_norm=layer_norm,
        max_sdf_std=max_sdf_std,
        info_scale=info_scale,
    )

    term_rad = term_thre_deg * jnp.pi / 180.0

    def _equilibrated_solve(A, B):
        """Solve A X = B for SPD-ish A via Jacobi equilibration."""
        d = jnp.sqrt(jnp.clip(jnp.diagonal(A), 1e-20))
        Dinv = 1.0 / d
        An = A * Dinv[:, None] * Dinv[None, :]
        Bn = B * Dinv[:, None]
        Xn = jnp.linalg.solve(An, Bn)
        return Xn * Dinv[:, None]

    @jax.jit
    def update(
        map_state,
        mlp,
        points_imu,
        mask,
        rot0,  # [3,3] f32 propagated rotation
        pos0,
        rest0,  # [12] vel, bg, ba, grav
        P,  # [18,18] f32
        travel_dist,
        cur_ts,
        window,
    ):
        P_inv = _equilibrated_solve(P, jnp.eye(18, dtype=jnp.float32))
        I18 = jnp.eye(18, dtype=jnp.float32)
        n_total = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

        def cond(carry):
            i, _, _, _, _, _, done, _, _ = carry
            return (i < max_iteration) & ~done

        def body(carry):
            i, rot, pos, rest, _, _, _, _, prev_step = carry
            # dx_new = x ⊟ x_propagated (utils/error_state_iekf.py:287)
            drot = lie.so3_log(rot0.T @ rot)
            dx_new = jnp.concatenate([drot, pos - pos0, rest - rest0])

            S6, b6, n_valid, _ = h_core(
                map_state, mlp, points_imu, mask, rot, pos,
                travel_dist, cur_ts, window,
            )
            S18 = jnp.zeros((18, 18), jnp.float32).at[:6, :6].set(S6)
            b18 = jnp.zeros((18,), jnp.float32).at[:6].set(b6)

            A = S18 + P_inv
            # [dx_solve | KH | A⁻¹] = A⁻¹ [b | S | I]; A⁻¹ is the posterior
            # covariance in information form (== (I-KH)P exactly, but
            # symmetric-PSD in f32 — see make_cached_update_fn)
            sol = _equilibrated_solve(
                A, jnp.concatenate([b18[:, None], S18, I18], axis=1)
            )
            Ainv_b = sol[:, 0]
            KH = sol[:, 1:19]
            A_inv = sol[:, 19:]
            dx = -Ainv_b + (KH - I18) @ dx_new
            # trust region (see make_cached_update_fn)
            tran_raw = jnp.linalg.norm(dx[3:6])
            dx = dx * jnp.minimum(1.0, 10.0 / jnp.maximum(tran_raw, 1e-12))

            rot = rot @ lie.so3_exp(dx[0:3])
            pos = pos + dx[3:6]
            rest = rest + dx[6:18]

            tran_m = jnp.linalg.norm(dx[3:6])
            rot_rad = jnp.linalg.norm(dx[0:3])
            converged = (
                (rot_rad < term_rad)
                & (tran_m < term_thre_m)
                & jnp.all(jnp.abs(dx[6:]) < eps)
            )
            # stagnation exit: once the pose increment stops shrinking the
            # f32 iteration is at its noise floor — the reference's exact
            # thresholds assume float64 and may be unreachable; further
            # iterations only jitter (pose kept, ~identical result)
            step = rot_rad + tran_m
            stalled = (i >= stagnation_iter) & (step >= prev_step)
            low_valid = (n_valid / n_total < min_valid_ratio) & (
                i == max_iteration - 1
            )
            return (
                i + 1, rot, pos, rest, A_inv, n_valid,
                converged | low_valid | stalled, ~low_valid, step,
            )

        init = (
            jnp.zeros((), jnp.int32),
            rot0,
            pos0,
            rest0,
            P,
            jnp.zeros(()),
            jnp.zeros((), bool),
            jnp.ones((), bool),
            jnp.full((), jnp.inf),
        )
        i, rot, pos, rest, A_inv, n_valid, _, ok, _ = jax.lax.while_loop(
            cond, body, init
        )
        # final low-validity check mirrors the reference (flag only
        # meaningful when the loop exhausted without convergence)
        ok = ok & ~((n_valid / n_total < min_valid_ratio) & (i == max_iteration))
        P_new = 0.5 * (A_inv + A_inv.T)
        return rot, pos, rest, P_new, ok, i

    return update
