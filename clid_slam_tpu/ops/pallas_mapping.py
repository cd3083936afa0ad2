"""Pallas TPU kernel: the entire per-frame mapping Adam loop in ONE kernel.

This is SURVEY §7.1 kernel #1. The steady-state mapping inner loop
(expanded-duplicates mode, mapper.py dup_independent) is pure dense math:
IDW-weighted feature sums -> MLP -> BCE + cached-tap eikonal -> manual
backward -> Adam on the [bs,k,F] features and the MLP.
Under XLA the loop body fragments into ~15 ops x iters with HBM<->VMEM
staging copies between them, and the [bs,k,F] arrays carry a T(8,128)
tile layout that pads the minor dims ~16x (r4 trace: ~15 ms/frame).

Here everything lives VMEM-resident in feature-major (transposed) layout
for the whole loop:

    fT, mT, vT      [K*F, bsp]       features + Adam moments (dense tiles)
    w0T             [8,   bsp]       IDW weights (rows 0..K-1)
    encw0T          [8,   bsp]       hoisted encoded-vector half (rows 0..P-1)
    rowsT           [8,   bsp]       row 0: sigmoid(label/sigma) targets,
                                     row 1: per-sample BCE weight
    wtapT           [6K pad, BD]     cached tap IDW weights (t*K+k)
    enctapwT        [6P pad, BD]     hoisted tap encodings (t*P+p)
    vdT             [8,   BD]        row 0: tap validity weights

``bsp`` is the batch padded to a chunk multiple; padded columns carry
zero weights (w0T / rowsT row 1 / wtapT / vdT), so they contribute no
loss and receive zero gradient — the Adam update leaves them untouched.

Options widened in r5 (VERDICT r4 item 7):
- arbitrary ``bs`` via column padding (caller pads, kernel sees bsp);
- ``n_hidden`` in {1, 2} hidden layers (geo_mlp_level, config.py:125);
- ``layer_norm``: per-(sample, k) normalization over the F feature dims
  (model/neural_points.py:620-647 layer_norm_on) with manual backward.

MLP forward/backward runs on the MXU in [hidden, lanes] orientation,
chunked over the batch so activations fit VMEM next to the resident
state. The per-frame write-back (mean over duplicates) stays outside.

Reference behavior matched: model/decoder.py:80-82 (scaled SDF MLP),
utils/mapper.py:750-766 (BCE), :696-704 (numerical-gradient eikonal),
utils/tools.py:251 (Adam betas 0.9/0.99, eps 1e-15, bias correction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HP = jax.lax.Precision.HIGHEST
LN_EPS = 1e-5


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_pallas_map_loop(
    *,
    bs: int,  # PADDED column count (multiple of chunk)
    knn_k: int,
    feature_dim: int,
    pos_dim: int,
    hidden: int,
    bd: int,
    dec_step: int,
    sdf_scale: float,
    sigma: float,
    lr: float,
    adam_eps: float,
    weight_e: float,
    num_grad_eps: float,
    b1: float = 0.9,
    b2: float = 0.99,
    chunk: int = 4096,
    n_hidden: int = 1,
    layer_norm: bool = False,
    interpret: bool = False,
):
    """Build the fused mapping-loop kernel.

    Returns fn(fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT,
               mlp_parts (W1p [IN_PAD,H], b1v [H,1][, W2 [H,H], b2v [H,1]],
                          WoutT8 [8,H], bout [1,1]),
               n_iters i32, mlp_lr f32, denom_inv f32, eik_den_inv f32)
        -> (fT', mlp_parts', losses[2])

    CALLER CONTRACT: samples must be pre-permuted so the bd decimated
    tap samples are the first columns (wtapT/vdT zero-padded to BD), and
    all [*, bs] inputs column-padded to ``bs`` with zero weights.
    """
    K, F, P, H = knn_k, feature_dim, pos_dim, hidden
    KF = K * F
    assert F == 8, "kernel assumes feature_dim 8 (one sublane group per k)"
    assert P <= 8
    assert n_hidden in (1, 2)
    IN_PAD = 16
    assert F + P <= IN_PAD
    BD = _round_up(bd, 128)
    n_chunks = bs // chunk
    assert bs % chunk == 0
    inv2eps = 1.0 / (2.0 * num_grad_eps)
    n_mlp = 2 * n_hidden + 2  # W1,b1[,W2,b2],WoutT,bout

    def _ln(f_k):
        """Per-column LN over the F sublane rows of one k group."""
        mu = jnp.sum(f_k, axis=0, keepdims=True) * (1.0 / F)
        xc = f_k - mu
        var = jnp.sum(xc * xc, axis=0, keepdims=True) * (1.0 / F)
        inv = jax.lax.rsqrt(var + LN_EPS)
        return xc * inv, inv

    def _ln_bwd(f_k, dy):
        """d(raw f_k) given d(LN(f_k)) — standard LN backward over F."""
        xhat, inv = _ln(f_k)
        mdy = jnp.sum(dy, axis=0, keepdims=True) * (1.0 / F)
        mdyx = jnp.sum(dy * xhat, axis=0, keepdims=True) * (1.0 / F)
        return inv * (dy - mdy - xhat * mdyx)

    def kernel(scal_ref, *refs):
        # unpack: 7 data inputs + n_mlp params | fT' + n_mlp outs + loss |
        # 5 feature scratch + 2*n_mlp moment scratch
        (fT_ref, w0T_ref, encw0T_ref, rowsT_ref,
         wtapT_ref, enctapwT_ref, vdT_ref) = refs[:7]
        mlp_in = refs[7 : 7 + n_mlp]
        o = 7 + n_mlp
        fTo_ref = refs[o]
        mlp_out = refs[o + 1 : o + 1 + n_mlp]
        loss_ref = refs[o + 1 + n_mlp]
        s = o + 2 + n_mlp
        mT, vT, dfT, fd, dfd = refs[s : s + 5]
        moms = refs[s + 5 :]  # (m, v) per mlp param, interleaved

        n_iters = scal_ref[0].astype(jnp.int32)
        mlp_lr = scal_ref[1]
        denom_inv = scal_ref[2]
        eik_den_inv = scal_ref[3]

        # resident state
        fTo_ref[:] = fT_ref[:]
        mT[:] = jnp.zeros_like(mT)
        vT[:] = jnp.zeros_like(vT)
        for pi in range(n_mlp):
            mlp_out[pi][:] = mlp_in[pi][:]
            moms[2 * pi][:] = jnp.zeros_like(moms[2 * pi])
            moms[2 * pi + 1][:] = jnp.zeros_like(moms[2 * pi + 1])

        def fwd_mlp(x, params):
            # x [IN_PAD, n] -> (cache, pred [1, n] unscaled)
            if n_hidden == 1:
                W1, b1v, WoutT, bout = params
            else:
                W1, b1v, W2, b2v, WoutT, bout = params
            hpre1 = jax.lax.dot_general(
                W1, x, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            ) + b1v  # [H, n]
            h1 = jnp.maximum(hpre1, 0.0)
            if n_hidden == 2:
                hpre2 = jax.lax.dot_general(
                    W2, h1, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HP,
                ) + b2v
                h_last = jnp.maximum(hpre2, 0.0)
                cache = (x, hpre1, h1, hpre2, h_last)
            else:
                h_last = h1
                cache = (x, hpre1, h1)
            pred8 = jax.lax.dot_general(
                WoutT, h_last, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            )  # [8, n], row 0 real
            return cache, pred8[0:1, :] + bout[0, 0]

        def bwd_mlp(cache, dpred, params):
            # dpred [1, n] -> (dx [IN_PAD,n], grads tuple like params)
            if n_hidden == 1:
                W1, b1v, WoutT, bout = params
                x, hpre1, h1 = cache
                h_last = h1
            else:
                W1, b1v, W2, b2v, WoutT, bout = params
                x, hpre1, h1, hpre2, h_last = cache
            dpred8 = jnp.concatenate(
                [dpred, jnp.zeros((7, dpred.shape[1]), jnp.float32)], axis=0
            )
            dh = jax.lax.dot_general(
                WoutT, dpred8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            )  # [H, n]
            gWoutT = jax.lax.dot_general(
                dpred8, h_last, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            )  # [8, H]
            gbout = jnp.sum(dpred)
            if n_hidden == 2:
                dh2 = jnp.where(hpre2 > 0.0, dh, 0.0)
                gW2 = jax.lax.dot_general(
                    h1, dh2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HP,
                )  # [H, H]
                gb2 = jnp.sum(dh2, axis=1, keepdims=True)
                dh = jax.lax.dot_general(
                    W2, dh2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=HP,
                )
            dh1 = jnp.where(hpre1 > 0.0, dh, 0.0)
            dx = jax.lax.dot_general(
                W1, dh1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            )  # [IN_PAD, n]
            gW1 = jax.lax.dot_general(
                x, dh1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HP,
            )  # [IN_PAD, H]
            gb1 = jnp.sum(dh1, axis=1, keepdims=True)  # [H,1]
            if n_hidden == 2:
                grads = (gW1, gb1, gW2, gb2, gWoutT,
                         jnp.full((1, 1), gbout, jnp.float32))
            else:
                grads = (gW1, gb1, gWoutT,
                         jnp.full((1, 1), gbout, jnp.float32))
            return dx, grads

        def adam(p, m_ref, v_ref, g, step_t, lr_):
            m = b1 * m_ref[:] + (1.0 - b1) * g
            v = b2 * v_ref[:] + (1.0 - b2) * g * g
            m_ref[:] = m
            v_ref[:] = v
            # b^t as exp(t*ln b): Mosaic has no powf legalization
            bc1 = 1.0 - jnp.exp(step_t * np.float32(np.log(b1)))
            bc2 = 1.0 - jnp.exp(step_t * np.float32(np.log(b2)))
            return p - lr_ * (m / bc1) / (
                jnp.sqrt(v / bc2) + adam_eps
            )

        def weighted_feat(f_all, w_row_of, n):
            """fw = Σ_k w_k · (LN?)(f_k) over one [KF, n] slab."""
            fw = jnp.zeros((F, n), jnp.float32)
            for k in range(K):
                f_k = f_all[k * F : (k + 1) * F, :]
                if layer_norm:
                    f_k = _ln(f_k)[0]
                fw = fw + w_row_of(k) * f_k
            return fw

        def feat_bwd(f_all, w_row_of, dfw, out_ref, sl, accumulate):
            """Scatter dfw back through the weighting (+LN) to raw rows."""
            for k in range(K):
                dy = w_row_of(k) * dfw
                if layer_norm:
                    f_k = f_all[k * F : (k + 1) * F, :]
                    dy = _ln_bwd(f_k, dy)
                if accumulate:
                    out_ref[k * F : (k + 1) * F, sl] = (
                        out_ref[k * F : (k + 1) * F, sl] + dy
                    )
                else:
                    out_ref[k * F : (k + 1) * F, sl] = dy

        def iteration(i, _):
            step_t = (i + 1).astype(jnp.float32)
            params = tuple(r[:] for r in mlp_out)
            mlp_grads = [
                jnp.zeros(r.shape, jnp.float32) for r in mlp_out
            ]
            sdf_loss = jnp.zeros((), jnp.float32)

            for c in range(n_chunks):
                sl = pl.ds(c * chunk, chunk)
                fch = fTo_ref[:, sl]  # [KF, ch]
                w0 = w0T_ref[:, sl]  # [8, ch]
                fw = weighted_feat(fch, lambda k: w0[k : k + 1, :], chunk)
                x = jnp.concatenate([fw, encw0T_ref[:, sl]], axis=0)
                cache, p_ml = fwd_mlp(x, params)
                pred = p_ml * sdf_scale
                lbl = rowsT_ref[0:1, sl]
                wsel = rowsT_ref[1:2, sl]
                z = pred / sigma
                s_ = jax.nn.sigmoid(z)
                bce = (
                    jnp.maximum(z, 0.0) - z * lbl
                    + jnp.log1p(jnp.exp(-jnp.abs(z)))
                )
                sdf_loss = sdf_loss + jnp.sum(wsel * bce)
                dpred = wsel * (s_ - lbl) * (denom_inv / sigma) * sdf_scale
                dx, grads_c = bwd_mlp(cache, dpred, params)
                for pi in range(n_mlp):
                    mlp_grads[pi] = mlp_grads[pi] + grads_c[pi]
                feat_bwd(
                    fch, lambda k: w0[k : k + 1, :], dx[0:F, :],
                    dfT, sl, accumulate=False,
                )

            # ---- cached-tap eikonal. CALLER CONTRACT: the batch is
            # permuted so the decimated tap samples occupy the FIRST BD
            # columns (bd real + zero-padded tap weights to the 128-lane
            # boundary) -- Mosaic has no strided lane loads, and the
            # loss is permutation-invariant over samples.
            fd[:] = fTo_ref[:, 0:BD]
            dfd[:] = jnp.zeros_like(dfd)
            vd = vdT_ref[0:1, :]
            tap_preds = []
            tap_cache = []
            for t in range(6):
                fwt = weighted_feat(
                    fd[:],
                    lambda k: wtapT_ref[t * K + k : t * K + k + 1, :],
                    BD,
                )
                enc_rows = enctapwT_ref[t * P : (t + 1) * P, :]
                xt = jnp.concatenate(
                    [fwt, enc_rows,
                     jnp.zeros((IN_PAD - F - P, BD), jnp.float32)],
                    axis=0,
                )
                cache_t, pm_t = fwd_mlp(xt, params)
                tap_preds.append(pm_t * sdf_scale)
                tap_cache.append(cache_t)
            g0 = (tap_preds[0] - tap_preds[3]) * inv2eps
            g1 = (tap_preds[1] - tap_preds[4]) * inv2eps
            g2 = (tap_preds[2] - tap_preds[5]) * inv2eps
            gn = jnp.sqrt(g0 * g0 + g1 * g1 + g2 * g2 + 1e-20)
            r = gn - 1.0
            eik_loss = jnp.sum(r * r * vd)
            dgn = 2.0 * r * vd * eik_den_inv * weight_e
            dg = [dgn * g0 / gn, dgn * g1 / gn, dgn * g2 / gn]
            for t in range(6):
                sgn = inv2eps if t < 3 else -inv2eps
                dtp = dg[t % 3] * sgn * sdf_scale
                dxt, grads_t = bwd_mlp(tap_cache[t], dtp, params)
                for pi in range(n_mlp):
                    mlp_grads[pi] = mlp_grads[pi] + grads_t[pi]
                feat_bwd(
                    fd[:],
                    lambda k: wtapT_ref[t * K + k : t * K + k + 1, :],
                    dxt[0:F, :],
                    dfd, slice(None), accumulate=True,
                )
            # taps are the leading columns: plain aligned accumulate
            dfT[:, 0:BD] = dfT[:, 0:BD] + dfd[:]

            # ---- Adam
            fTo_ref[:] = adam(fTo_ref[:], mT, vT, dfT[:], step_t, lr)
            for pi in range(n_mlp):
                mlp_out[pi][:] = adam(
                    mlp_out[pi][:], moms[2 * pi], moms[2 * pi + 1],
                    mlp_grads[pi], step_t, mlp_lr,
                )
            loss_ref[:] = jnp.stack(
                [sdf_loss * denom_inv, eik_loss * eik_den_inv]
            ).reshape(1, 2)
            return 0

        jax.lax.fori_loop(0, n_iters, iteration, 0)

    mlp_shapes = [
        ((IN_PAD, H), (H, 1)),
        ((H, H), (H, 1)),
    ][: n_hidden]
    mlp_shapes = [s for pair in mlp_shapes for s in pair] + [(8, H), (1, 1)]
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((KF, bs), jnp.float32)]  # fT'
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in mlp_shapes]
        + [jax.ShapeDtypeStruct((1, 2), jnp.float32)]  # losses
    )
    scratch = [
        pltpu.VMEM((KF, bs), jnp.float32),   # mT
        pltpu.VMEM((KF, bs), jnp.float32),   # vT
        pltpu.VMEM((KF, bs), jnp.float32),   # dfT
        pltpu.VMEM((KF, BD), jnp.float32),   # fd
        pltpu.VMEM((KF, BD), jnp.float32),   # dfd
    ] + [
        pltpu.VMEM(s, jnp.float32)
        for s in mlp_shapes
        for _ in (0, 1)  # (m, v) per param
    ]

    @jax.jit
    def run(fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT,
            mlp_parts, n_iters, mlp_lr, denom_inv, eik_den_inv):
        assert len(mlp_parts) == n_mlp
        scal = jnp.stack([
            jnp.asarray(n_iters, jnp.float32),
            jnp.asarray(mlp_lr, jnp.float32),
            jnp.asarray(denom_inv, jnp.float32),
            jnp.asarray(eik_den_inv, jnp.float32),
        ])
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (7 + n_mlp),
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
            ),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(scal, fT, w0T, encw0T, rowsT, wtapT, enctapwT, vdT, *mlp_parts)
        fT2 = outs[0]
        mlp_new = outs[1 : 1 + n_mlp]
        losses = outs[1 + n_mlp]
        return fT2, mlp_new, losses

    return run
