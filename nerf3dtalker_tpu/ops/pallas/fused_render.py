"""Fused NeRF point-MLP + volume compositing Pallas kernel.

The hot loop of the framework (SURVEY.md §7 Phase 3, BASELINE.json north
star): for each (batch, ray-tile) grid step, evaluate the 8-layer 384-wide
MLP (NetWorks/models.py:29-87 topology) over the tile's 64 samples and
alpha-composite (NetWorks/utils.py:268-308) — entirely in VMEM. The
[P, 384] inter-layer activations never touch HBM; per chip we read only
the 64-f32 positional encoding per point and write the 256-f32 composited
feature per ray. Weights stay VMEM-resident across the whole grid
(constant index_map).

Weight/bias layout (kernels [in, out]; per-batch conditioning codes folded
into biases by `pack_weights` — a linear op, so grads flow back through it):
  w0p   [PE_PAD, H]  fea_0 rows for the (padded) positional encoding
  wh    [6, H, H]    fea_1..4, fea_6, fea_7
  w5p   [PE_PAD, H]  fea_5 skip rows for PE     (skip concat [vp | x])
  w5x   [H, H]       fea_5 rows for the hidden state
  wd    [H, DPAD]    density head (col 0 live, lane-padded)
  wr0   [H, H]       rgb_0 (no activation after; models.py:78)
  wr1   [H, H2]      rgb_1 hidden rows (appearance code folded into br1)
  wr2   [H2, C]      rgb_2
  b0, b5 [B, H]; br1 [B, H2]  — per-batch (code-dependent)
  bh [6, H]; bd scalar; br0 [H]; br2 [C] — shared

The cumulative transmittance product is computed in log space with a
strictly-lower-triangular matmul (exclusive cumsum on the MXU) — no scan.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flagship (Reso32/64) dimensions. The kernels below derive every dim from
# the input/weight shapes, so non-flagship sizes work too (used by the tiny
# interpret-mode configs in tests and dryrun_multichip); on real TPU the
# flagship dims are the lane-aligned ones Mosaic is tuned for.
H = 384          # mlp hidden (HeadNeRFOptions.py:25)
H2 = 192         # rgb_1 out (h // 2)
PE_PAD = 64      # 63-d PE padded to lane-friendly 64
DPAD = 128       # density head padded lanes
NS = 64          # samples per ray (HeadNeRFOptions.py:20)
FEAT = 256       # featmap_nc


def pe_pad_for(p_live: int) -> int:
    """Sublane-friendly padded PE width (63 -> 64). The single source of
    truth shared by pack_weights and the model's PE assembly."""
    return -(-p_live // 8) * 8


def _mlp_tile(pe, w0p, wh, w5p, w5x, wd, wr0, wr1, wr2,
              b0, bh, b5, bd, br0, br1, br2, dtype):
    """Point MLP over one tile: pe [N, PE_PAD] -> (rgb [N, FEAT], sigma [N])."""
    f32 = jnp.float32

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    pe = pe.astype(dtype)
    x = jnp.maximum(mm(pe, w0p) + b0, 0.0).astype(dtype)
    for i in range(4):                      # fea_1..fea_4
        x = jnp.maximum(mm(x, wh[i]) + bh[i], 0.0).astype(dtype)
    # fea_5 with skip concat [pe|shape | x] -> split matmuls
    x = jnp.maximum(mm(pe, w5p) + mm(x, w5x) + b5, 0.0).astype(dtype)
    for i in range(4, 6):                   # fea_6, fea_7
        x = jnp.maximum(mm(x, wh[i]) + bh[i], 0.0).astype(dtype)

    sigma = jnp.maximum(mm(x, wd)[:, 0] + bd, 0.0)          # relu density
    r = (mm(x, wr0) + br0).astype(dtype)                    # no activation
    r = jnp.maximum(mm(r, wr1) + br1, 0.0).astype(dtype)
    rgb = mm(r, wr2) + br2                                  # f32 out
    return rgb, sigma


def _exclusive_cumprod(t):
    """Exact exclusive cumulative product along the last (NS) axis via
    log2(NS) shift-multiply doubling steps — no scan, no log-space loss."""
    ns = t.shape[-1]
    ones = jnp.ones_like(t[..., :1])
    # shift right by 1 (exclusive), then inclusive scan by doubling
    t = jnp.concatenate([ones, t[..., :-1]], axis=-1)
    shift = 1
    while shift < ns:
        pad = jnp.ones_like(t[..., :shift])
        t = t * jnp.concatenate([pad, t[..., :-shift]], axis=-1)
        shift *= 2
    return t


def _composite_tile(rgb, sigma, z_dists, zvals, tr, ltri):
    """rgb [TR*NS, FEAT], sigma [TR*NS] -> feat [TR, FEAT], aux."""
    del ltri  # retained in the signature for ABI stability
    ns = z_dists.shape[-1]
    sigma = sigma.reshape(tr, ns)
    alpha = 1.0 - jnp.exp(-sigma * z_dists)
    trans = _exclusive_cumprod(1.0 - alpha + 1e-10)
    w = alpha * trans                                        # [TR, NS]
    feat = jnp.sum(rgb.reshape(tr, ns, -1) * w[:, :, None], axis=1)
    acc = jnp.sum(w, axis=-1)
    depth = jnp.sum(w * zvals, axis=-1)
    return feat, 1.0 - acc, depth, w


def _fwd_kernel(pe_ref, zd_ref, zv_ref,
                w0p, wh, w5p, w5x, wd, wr0, wr1, wr2,
                b0, bh, b5, bd, br0, br1, br2, ltri,
                feat_ref, aux_ref, *, tr, dtype):
    ns, pe_pad = pe_ref.shape[-2], pe_ref.shape[-1]
    dpad = aux_ref.shape[-1]
    pe = pe_ref[...].reshape(tr * ns, pe_pad)
    rgb, sigma = _mlp_tile(
        pe, w0p[...], wh[...], w5p[...], w5x[...], wd[...], wr0[...],
        wr1[...], wr2[...],
        b0[...][0, 0], bh[...], b5[...][0, 0], bd[0, 0], br0[...],
        br1[...][0, 0], br2[...], dtype,
    )
    feat, bg_alpha, depth, w = _composite_tile(
        rgb, sigma, zd_ref[...][0], zv_ref[...][0], tr, ltri[...]
    )
    feat_ref[...] = feat[None]
    # column-packed aux (Pallas TPU has no scatter; build by concat)
    aux = jnp.concatenate(
        [bg_alpha[:, None], depth[:, None],
         jnp.zeros((tr, dpad - 2), jnp.float32)],
        axis=1,
    )
    aux_ref[...] = aux[None]


def _strict_lower_tri(ns=NS):
    return np.tril(np.ones((ns, ns), np.float32), k=-1)


def _sublane8(arr: jnp.ndarray) -> jnp.ndarray:
    """[B, X] -> [B, 8, X] (row broadcast into the padded sublane dim)."""
    return jnp.broadcast_to(arr[:, None, :], (arr.shape[0], 8, arr.shape[1]))


@functools.partial(
    jax.jit, static_argnames=("tile_rays", "compute_dtype", "interpret")
)
def fused_render_fwd(
    pe: jnp.ndarray,        # [B, R, NS, PE_PAD] f32 (PE padded 63 -> 64)
    z_dists: jnp.ndarray,   # [B, R, NS]
    zvals: jnp.ndarray,     # [B, R, NS]
    weights: dict,          # packed kernel weights, see pack_weights()
    tile_rays: int = 256,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (features [B, R, FEAT], bg_alpha [B, R], depth [B, R])."""
    B, R, ns, pe_pad = pe.shape
    feat_nc = weights["wr2"].shape[-1]
    dpad = weights["wd"].shape[-1]
    hidden, h2 = weights["wh"].shape[-1], weights["wr1"].shape[-1]
    assert R % tile_rays == 0, (R, tile_rays)
    n_tiles = R // tile_rays
    cdt = compute_dtype

    ltri = jnp.asarray(_strict_lower_tri(ns))

    def ray_block(shape):
        return pl.BlockSpec(
            (1, tile_rays) + shape,
            lambda b, t: (b, t) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def const_block(arr):
        return pl.BlockSpec(
            arr.shape, lambda b, t: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    def bbatch_block(arr):  # [B, 8, X] -> per-batch (8-sublane-padded) row
        return pl.BlockSpec(
            (1, 8, arr.shape[2]), lambda b, t: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )

    w = {k: v.astype(cdt) for k, v in weights.items() if k.startswith("w")}
    b = {k: v.astype(jnp.float32) for k, v in weights.items() if k.startswith("b")}
    bd = b["bd"].reshape(1, 1)
    # per-batch rows padded to 8 sublanes: Mosaic requires block dims
    # divisible by (8, 128) or equal to the array dims, so a (1, X) block of
    # a [B, X] array is only legal at B == 1
    b0_8, b5_8, br1_8 = (_sublane8(b[k]) for k in ("b0", "b5", "br1"))

    args = (
        pe, z_dists, zvals,
        w["w0p"], w["wh"], w["w5p"], w["w5x"], w["wd"],
        w["wr0"], w["wr1"], w["wr2"],
        b0_8, b["bh"], b5_8, bd, b["br0"], br1_8, b["br2"], ltri,
    )
    in_specs = (
        [ray_block((ns, pe_pad)), ray_block((ns,)), ray_block((ns,))]
        + [const_block(a) for a in args[3:11]]
        + [bbatch_block(b0_8), const_block(b["bh"]), bbatch_block(b5_8),
           const_block(bd), const_block(b["br0"]), bbatch_block(br1_8),
           const_block(b["br2"]), const_block(ltri)]
    )

    feat, aux = pl.pallas_call(
        functools.partial(_fwd_kernel, tr=tile_rays, dtype=cdt),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=[ray_block((feat_nc,)), ray_block((dpad,))],
        out_shape=[
            jax.ShapeDtypeStruct((B, R, feat_nc), jnp.float32),
            jax.ShapeDtypeStruct((B, R, dpad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * ns * (pe_pad * hidden + 7 * hidden * hidden
                                    + pe_pad * hidden + hidden * h2
                                    + h2 * feat_nc + hidden * dpad),
            bytes_accessed=B * R * ns * pe_pad * 4 + B * R * feat_nc * 4,
            transcendentals=B * R * ns,
        ),
    )(*args)
    return feat, aux[..., 0], aux[..., 1]


def pack_weights(mlp_params: dict, shape_code, appea_code, audio_style) -> dict:
    """Fold the reference-layout NeRFMLP params (models/nerf_mlp.py) plus
    the per-batch [B, ...] conditioning codes into the kernel layout.

    The live PE width is derived from the fea_0 kernel (rows = PE + shape
    [+gaze] + audio) and padded up to a sublane-friendly multiple of 8 —
    64 for the flagship's 63-d PE."""
    p = mlp_params
    S = shape_code.shape[-1]
    A = audio_style.shape[-1]
    P_LIVE = p["fea_0_kernel"].shape[0] - S - A
    pe_pad = pe_pad_for(P_LIVE)

    def pad_pe_rows(k):
        return jnp.pad(k, ((0, pe_pad - P_LIVE), (0, 0)))

    k0 = p["fea_0_kernel"]          # [63+179+64, H]
    b0 = (
        shape_code @ k0[P_LIVE : P_LIVE + S]
        + audio_style @ k0[P_LIVE + S :]
        + p["fea_0_bias"]
    )                               # [B, H]
    hidden = p["fea_1_kernel"].shape[0]
    k5 = p["fea_5_kernel"]          # [63+179+H, H]
    b5 = shape_code @ k5[P_LIVE : P_LIVE + S] + p["fea_5_bias"]
    kr1 = p["rgb_1_kernel"]         # [H+127, H2]
    br1 = appea_code @ kr1[hidden:] + p["rgb_1_bias"]

    wh = jnp.stack([p[f"fea_{i}_kernel"] for i in (1, 2, 3, 4, 6, 7)])
    bh = jnp.stack([p[f"fea_{i}_bias"] for i in (1, 2, 3, 4, 6, 7)])

    return {
        "w0p": pad_pe_rows(k0[:P_LIVE]),
        "wh": wh,
        "w5p": pad_pe_rows(k5[:P_LIVE]),
        "w5x": k5[P_LIVE + S :],
        "wd": jnp.pad(p["density_kernel"], ((0, 0), (0, DPAD - 1))),
        "wr0": p["rgb_0_kernel"],
        "wr1": kr1[:hidden],
        "wr2": p["rgb_2_kernel"],
        "b0": b0,
        "bh": bh,
        "b5": b5,
        "bd": p["density_bias"].reshape(()),
        "br0": p["rgb_0_bias"],
        "br1": br1,
        "br2": p["rgb_2_bias"],
    }


def reference_render(pe, z_dists, zvals, weights, compute_dtype=jnp.float32):
    """Pure-jnp oracle with identical math (parity tests + the recompute
    path of the custom_vjp backward). Shapes as fused_render_fwd."""
    B, R, ns, pe_pad = pe.shape
    w = {k: (v.astype(compute_dtype) if k.startswith("w") else v)
         for k, v in weights.items()}
    ltri = jnp.asarray(_strict_lower_tri(ns))

    def one(pe_b, zd_b, zv_b, b0, b5, br1):
        flat = pe_b.reshape(R * ns, pe_pad)
        rgb, sigma = _mlp_tile(
            flat, w["w0p"], w["wh"], w["w5p"], w["w5x"], w["wd"], w["wr0"],
            w["wr1"], w["wr2"],
            b0, w["bh"], b5, w["bd"], w["br0"], br1, w["br2"],
            compute_dtype,
        )
        return _composite_tile(rgb, sigma, zd_b, zv_b, R, ltri)[:3]

    feat, bg, depth = jax.vmap(one)(
        pe, z_dists, zvals, w["b0"], w["b5"], w["br1"]
    )
    return feat, bg, depth


# ---------------------------------------------------------------- backward


def _mlp_tile_fwd_stash(pe, w0p, wh, w5p, w5x, wd, wr0, wr1, wr2,
                        b0, bh, b5, bd, br0, br1, br2, dtype):
    """Forward keeping every activation for the in-kernel backward."""
    f32 = jnp.float32

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    pe = pe.astype(dtype)
    xs = []
    x = jnp.maximum(mm(pe, w0p) + b0, 0.0).astype(dtype)
    xs.append(x)
    for i in range(4):
        x = jnp.maximum(mm(x, wh[i]) + bh[i], 0.0).astype(dtype)
        xs.append(x)
    x = jnp.maximum(mm(pe, w5p) + mm(x, w5x) + b5, 0.0).astype(dtype)
    xs.append(x)
    for i in range(4, 6):
        x = jnp.maximum(mm(x, wh[i]) + bh[i], 0.0).astype(dtype)
        xs.append(x)

    sigma_pre = mm(x, wd)[:, 0] + bd
    sigma = jnp.maximum(sigma_pre, 0.0)
    r0 = (mm(x, wr0) + br0).astype(dtype)
    r1 = jnp.maximum(mm(r0, wr1) + br1, 0.0).astype(dtype)
    rgb = mm(r1, wr2) + br2
    return pe, xs, sigma_pre, sigma, r0, r1, rgb


def _bwd_kernel(pe_ref, zd_ref, zv_ref, gf_ref, gaux_ref,
                w0p, wh, w5p, w5x, wd, wr0, wr1, wr2,
                w0pT, whT, w5pT, w5xT, wdT, wr0T, wr1T, wr2T,
                b0, bh, b5, bd, br0, br1, br2, ltri,
                dpe_ref, dzd_ref, dzv_ref,
                dw0p, dwh0, dwh1, dwh2, dwh3, dwh4, dwh5,
                dw5p, dw5x, dwd, dwr0, dwr1, dwr2,
                db0, dbh0, dbh1, dbh2, dbh3, dbh4, dbh5,
                db5, dbd, dbr0, dbr1, dbr2,
                *, tr, dtype, input_grads):
    """Recompute forward, backprop in VMEM, accumulate weight grads across
    grid steps (constant-index outputs persist; init on the first step)."""
    f32 = jnp.float32
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    def mm(a, b):
        """standard a @ b (b pre-transposed outside the kernel — Mosaic on
        this toolchain cannot relayout operands for transposed
        contractions, 'Not implemented: Offset change')."""
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def mmT_l(a, b):
        """a.T @ b : contract first dims, bf16 operands, f32 accumulate.
        (An earlier toolchain could not relayout computed bf16 values into
        the transposed-contraction layout — 'Not implemented: Offset
        change' — which forced f32 operands at ~4x MXU cost; the current
        toolchain lowers computed-bf16 transposed contractions fine, see
        scripts/probe_mosaic_bf16T.py.)"""
        return jax.lax.dot_general(
            a.astype(dtype), b.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    ns, pe_pad = pe_ref.shape[-2], pe_ref.shape[-1]
    dpad = wd.shape[-1]
    pe_in = pe_ref[...].reshape(tr * ns, pe_pad)
    pe, xs, sigma_pre, sigma, r0, r1, rgb = _mlp_tile_fwd_stash(
        pe_in, w0p[...], wh[...], w5p[...], w5x[...], wd[...], wr0[...],
        wr1[...], wr2[...],
        b0[...][0, 0], bh[...], b5[...][0, 0], bd[0, 0], br0[...],
        br1[...][0, 0], br2[...], dtype,
    )
    zd = zd_ref[...][0]
    zv = zv_ref[...][0]

    # ---- composite fwd (for weights) + bwd ----
    sig = sigma.reshape(tr, ns)
    alpha = 1.0 - jnp.exp(-sig * zd)
    t = 1.0 - alpha + 1e-10
    T = _exclusive_cumprod(t)
    w = alpha * T                                       # [tr, NS]

    g_feat = gf_ref[...][0]                              # [tr, FEAT]
    gaux = gaux_ref[...][0]                              # [tr, DPAD]
    g_bg = gaux[:, 0]
    g_depth = gaux[:, 1]

    rgb3 = rgb.reshape(tr, ns, -1)
    d_rgb = (w[:, :, None] * g_feat[:, None, :]).reshape(tr * ns, -1)
    d_w = (
        jnp.sum(rgb3 * g_feat[:, None, :], axis=-1)
        + zv * g_depth[:, None]
        - g_bg[:, None]
    )                                                    # [tr, NS]
    c = d_w * w
    # exclusive suffix sum over samples: S_s = sum_{u>s} c_u
    S = jax.lax.dot_general(
        c, ltri[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    d_alpha = d_w * T - S / t
    one_m_a = 1.0 - alpha
    d_sigma = d_alpha * zd * one_m_a
    if input_grads:
        dzd_ref[...] = (d_alpha * sig * one_m_a)[None]
        dzv_ref[...] = (w * g_depth[:, None])[None]
    d_sigma_pre = (d_sigma.reshape(tr * ns) * (sigma_pre > 0)).astype(f32)

    # ---- MLP backward, interleaved with dW accumulation ----
    # Each gradient activation is consumed by its dW/db update immediately
    # and dies, so only ~2 of them are ever live — at tile 64 the
    # all-gs-then-all-dW ordering kept 9 f32 [4096, H] tensors alive
    # (~57 MB) and blew VMEM. Gradient activations are stored bf16 (they
    # feed MXU contractions as bf16 anyway; bias colsums still accumulate
    # f32 on the MXU).
    first = (b_idx == 0) & (t_idx == 0)
    first_t = t_idx == 0

    dwh_refs = (dwh0, dwh1, dwh2, dwh3, dwh4, dwh5)
    dbh_refs = (dbh0, dbh1, dbh2, dbh3, dbh4, dbh5)

    @pl.when(first)
    def _():
        for ref in (dw0p, dw5p, dw5x, dwd, dwr0, dwr1, dwr2,
                    dbd, dbr0, dbr2) + dwh_refs + dbh_refs:
            ref[...] = jnp.zeros_like(ref)

    @pl.when(first_t)
    def _():
        db0[...] = jnp.zeros_like(db0)
        db5[...] = jnp.zeros_like(db5)
        dbr1[...] = jnp.zeros_like(dbr1)

    # Masks are applied in the f32 domain then cast to bf16 once: Mosaic on
    # this toolchain cannot feed comparison-masked *bf16* values into MXU
    # contractions ("Not implemented: Offset change"); a cast of the masked
    # f32 value lowers fine (see memory: axon-tpu-environment).
    def relu_mask(g_f32, act):
        return (g_f32 * (act.astype(f32) > 0).astype(f32)).astype(dtype)

    ones_row = jnp.ones((1, tr * ns), dtype)

    def colsum(x):
        # rank-2 single-row accumulators; bias sums as ones-row matvecs —
        # Mosaic rejects sublane-axis (axis 0) reductions here
        return jax.lax.dot_general(
            ones_row, x.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def brow(x):  # [1, X] -> [1, 8, X] (row 0 live, rows 1-7 zero)
        return jnp.concatenate(
            [x[None], jnp.zeros((1, 7, x.shape[1]), f32)], axis=1
        )

    d_sig_pad = jnp.concatenate(
        [d_sigma_pre[:, None], jnp.zeros((tr * ns, dpad - 1), f32)], axis=1
    ).astype(dtype)
    d_rgb16 = d_rgb.astype(dtype)
    dwr2[...] += mmT_l(r1, d_rgb16)
    dbr2[...] += colsum(d_rgb16)
    d_r1 = relu_mask(mm(d_rgb16, wr2T[...]), r1)         # [N, H2] bf16
    dwr1[...] += mmT_l(r0, d_r1)
    dbr1[...] += brow(colsum(d_r1))
    d_r0 = mm(d_r1, wr1T[...]).astype(dtype)             # [N, H] (no relu)
    dwr0[...] += mmT_l(xs[7], d_r0)
    dbr0[...] += colsum(d_r0)
    dwd[...] += mmT_l(xs[7], d_sig_pad)
    dbd[...] += colsum(d_sig_pad)     # col 0 = sum d_sigma_pre, rest 0

    g7 = relu_mask(
        mm(d_sig_pad, wdT[...]) + mm(d_r0, wr0T[...]), xs[7]
    )
    dwh5[...] += mmT_l(xs[6], g7)
    dbh5[...] += colsum(g7)
    g6 = relu_mask(mm(g7, whT[...][5]), xs[6])
    dwh4[...] += mmT_l(xs[5], g6)
    dbh4[...] += colsum(g6)
    g5 = relu_mask(mm(g6, whT[...][4]), xs[5])
    dw5p[...] += mmT_l(pe, g5)
    dw5x[...] += mmT_l(xs[4], g5)
    db5[...] += brow(colsum(g5))
    g4 = relu_mask(mm(g5, w5xT[...]), xs[4])
    dwh3[...] += mmT_l(xs[3], g4)
    dbh3[...] += colsum(g4)
    g3 = relu_mask(mm(g4, whT[...][3]), xs[3])
    dwh2[...] += mmT_l(xs[2], g3)
    dbh2[...] += colsum(g3)
    g2 = relu_mask(mm(g3, whT[...][2]), xs[2])
    dwh1[...] += mmT_l(xs[1], g2)
    dbh1[...] += colsum(g2)
    g1 = relu_mask(mm(g2, whT[...][1]), xs[1])
    dwh0[...] += mmT_l(xs[0], g1)
    dbh0[...] += colsum(g1)
    g0 = relu_mask(mm(g1, whT[...][0]), xs[0])
    dw0p[...] += mmT_l(pe, g0)
    db0[...] += brow(colsum(g0))

    if input_grads:
        d_pe = mm(g0, w0pT[...]) + mm(g5, w5pT[...])
        dpe_ref[...] = d_pe.reshape(1, tr, ns, pe_pad)


@functools.partial(
    jax.jit,
    static_argnames=("tile_rays", "compute_dtype", "interpret", "input_grads"),
)
def fused_render_bwd(
    pe, z_dists, zvals, weights, g_feat, g_bg, g_depth,
    tile_rays: int = 16, compute_dtype=jnp.bfloat16, interpret: bool = False,
    input_grads: bool = True,
):
    """Pallas backward: returns (d_pe, d_zd, d_zv, d_weights).

    With ``input_grads=False`` the d_pe/d_zd/d_zv outputs are dropped from
    the pallas_call (zeros returned instead) — the training step never
    differentiates w.r.t. ray geometry, and Pallas outputs cannot be
    dead-code-eliminated by XLA, so keeping them costs ~270 MB of HBM
    writes + two [N,H]x[H,PE_PAD] matmuls per step for nothing. The
    fitting drivers (camera/code optimization) use input_grads=True."""
    B, R, ns, pe_pad = pe.shape
    hidden, h2 = weights["wh"].shape[-1], weights["wr1"].shape[-1]
    feat_nc = weights["wr2"].shape[-1]
    dpad = weights["wd"].shape[-1]
    assert R % tile_rays == 0
    n_tiles = R // tile_rays
    cdt = compute_dtype
    f32 = jnp.float32

    ltri = jnp.asarray(_strict_lower_tri(ns))
    gaux = jnp.concatenate(
        [g_bg[..., None], g_depth[..., None],
         jnp.zeros(g_bg.shape + (dpad - 2,), f32)], axis=-1,
    )

    def ray_block(shape):
        return pl.BlockSpec(
            (1, tile_rays) + shape,
            lambda b, t: (b, t) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def const_block(arr):
        return pl.BlockSpec(
            arr.shape, lambda b, t: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    def bbatch_block(arr):
        return pl.BlockSpec(
            (1, 8, arr.shape[2]), lambda b, t: (b, 0, 0),
            memory_space=pltpu.VMEM,
        )

    w = {k: v.astype(cdt) for k, v in weights.items() if k.startswith("w")}
    b = {k: v.astype(f32) for k, v in weights.items() if k.startswith("b")}
    bd = b["bd"].reshape(1, 1)
    b0_8, b5_8, br1_8 = (_sublane8(b[k]) for k in ("b0", "b5", "br1"))

    # pre-transposed copies for the in-kernel dx chain (XLA-side transpose)
    wT = {
        "w0pT": w["w0p"].T, "whT": jnp.transpose(w["wh"], (0, 2, 1)),
        "w5pT": w["w5p"].T, "w5xT": w["w5x"].T, "wdT": w["wd"].T,
        "wr0T": w["wr0"].T, "wr1T": w["wr1"].T, "wr2T": w["wr2"].T,
    }
    args = (
        pe, z_dists, zvals, g_feat, gaux,
        w["w0p"], w["wh"], w["w5p"], w["w5x"], w["wd"],
        w["wr0"], w["wr1"], w["wr2"],
        wT["w0pT"], wT["whT"], wT["w5pT"], wT["w5xT"], wT["wdT"],
        wT["wr0T"], wT["wr1T"], wT["wr2T"],
        b0_8, b["bh"], b5_8, bd, b["br0"], br1_8, b["br2"], ltri,
    )
    in_specs = (
        [ray_block((ns, pe_pad)), ray_block((ns,)), ray_block((ns,)),
         ray_block((feat_nc,)), ray_block((dpad,))]
        + [const_block(a) for a in args[5:21]]
        + [bbatch_block(b0_8), const_block(b["bh"]), bbatch_block(b5_8),
           const_block(bd), const_block(b["br0"]), bbatch_block(br1_8),
           const_block(b["br2"]), const_block(ltri)]
    )

    def acc_block(shape):
        return pl.BlockSpec(
            shape, lambda bq, t: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def bacc_block(shape):  # [B, 8, X] per-batch accumulator (row 0 live)
        return pl.BlockSpec(
            (1,) + shape[1:], lambda bq, t: (bq,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    ray_outs = [
        jax.ShapeDtypeStruct((B, R, ns, pe_pad), f32),   # d_pe
        jax.ShapeDtypeStruct((B, R, ns), f32),           # d_zd
        jax.ShapeDtypeStruct((B, R, ns), f32),           # d_zv
    ] if input_grads else []
    out_shape = ray_outs + [
        jax.ShapeDtypeStruct((pe_pad, hidden), f32),     # dw0p
    ] + [jax.ShapeDtypeStruct((hidden, hidden), f32)] * 6 + [  # dwh0..5
        jax.ShapeDtypeStruct((pe_pad, hidden), f32),     # dw5p
        jax.ShapeDtypeStruct((hidden, hidden), f32),     # dw5x
        jax.ShapeDtypeStruct((hidden, dpad), f32),       # dwd
        jax.ShapeDtypeStruct((hidden, hidden), f32),     # dwr0
        jax.ShapeDtypeStruct((hidden, h2), f32),         # dwr1
        jax.ShapeDtypeStruct((h2, feat_nc), f32),        # dwr2
        jax.ShapeDtypeStruct((B, 8, hidden), f32),       # db0 (row 0 live)
    ] + [jax.ShapeDtypeStruct((1, hidden), f32)] * 6 + [  # dbh0..5
        jax.ShapeDtypeStruct((B, 8, hidden), f32),       # db5 (row 0 live)
        jax.ShapeDtypeStruct((1, dpad), f32),            # dbd (col 0)
        jax.ShapeDtypeStruct((1, hidden), f32),          # dbr0
        jax.ShapeDtypeStruct((B, 8, h2), f32),           # dbr1 (row 0 live)
        jax.ShapeDtypeStruct((1, feat_nc), f32),         # dbr2
    ]
    ray_out_specs = (
        [ray_block((ns, pe_pad)), ray_block((ns,)), ray_block((ns,))]
        if input_grads else []
    )
    out_specs = ray_out_specs + [
        acc_block((pe_pad, hidden)),
    ] + [acc_block((hidden, hidden))] * 6 + [
        acc_block((pe_pad, hidden)), acc_block((hidden, hidden)),
        acc_block((hidden, dpad)),
        acc_block((hidden, hidden)), acc_block((hidden, h2)),
        acc_block((h2, feat_nc)),
        bacc_block((B, 8, hidden)),
    ] + [acc_block((1, hidden))] * 6 + [
        bacc_block((B, 8, hidden)),
        acc_block((1, dpad)), acc_block((1, hidden)), bacc_block((B, 8, h2)),
        acc_block((1, feat_nc)),
    ]

    n_in = len(args)
    if input_grads:
        kern = functools.partial(
            _bwd_kernel, tr=tile_rays, dtype=cdt, input_grads=True
        )
    else:
        def kern(*refs):
            _bwd_kernel(
                *refs[:n_in], None, None, None, *refs[n_in:],
                tr=tile_rays, dtype=cdt, input_grads=False,
            )

    outs = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)

    if input_grads:
        d_pe, d_zd, d_zv = outs[:3]
        outs = outs[3:]
    else:
        d_pe = jnp.zeros_like(pe)
        d_zd = jnp.zeros_like(z_dists)
        d_zv = jnp.zeros_like(zvals)
    (dw0p, dwh0, dwh1, dwh2, dwh3, dwh4, dwh5,
     dw5p, dw5x, dwd, dwr0, dwr1, dwr2,
     db0, dbh0, dbh1, dbh2, dbh3, dbh4, dbh5,
     db5, dbd, dbr0, dbr1, dbr2) = outs
    dwh = jnp.stack([dwh0, dwh1, dwh2, dwh3, dwh4, dwh5])
    dbh = jnp.concatenate([dbh0, dbh1, dbh2, dbh3, dbh4, dbh5], axis=0)
    d_weights = {
        "w0p": dw0p, "wh": dwh, "w5p": dw5p, "w5x": dw5x, "wd": dwd,
        "wr0": dwr0, "wr1": dwr1, "wr2": dwr2,
        "b0": db0[:, 0], "bh": dbh, "b5": db5[:, 0],
        "bd": dbd[0, 0].reshape(()),
        "br0": dbr0[0], "br1": dbr1[:, 0], "br2": dbr2[0],
    }
    return d_pe, d_zd, d_zv, d_weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_render(pe, z_dists, zvals, weights,
                 tile_rays=256, compute_dtype=jnp.bfloat16, interpret=False,
                 input_grads=True):
    """Differentiable fused render: Pallas forward, recompute backward.

    Gradients flow to pe, z-geometry, and every packed weight/bias (and
    through `pack_weights`' linear fold, to the original MLP params and
    conditioning codes). With ``input_grads=False`` the pe/z cotangents
    are hard zeros (the Pallas backward skips their compute + HBM writes)
    — only valid when nothing upstream of pe/z_dists/zvals is being
    differentiated (the parameter-only training step).
    """
    return fused_render_fwd(
        pe, z_dists, zvals, weights,
        tile_rays=tile_rays, compute_dtype=compute_dtype, interpret=interpret,
    )


def _fused_render_f(pe, zd, zv, weights, tile_rays, compute_dtype, interpret,
                    input_grads):
    out = fused_render_fwd(
        pe, zd, zv, weights,
        tile_rays=tile_rays, compute_dtype=compute_dtype, interpret=interpret,
    )
    return out, (pe, zd, zv, weights)


def _fused_render_b(tile_rays, compute_dtype, interpret, input_grads, res, g):
    pe, zd, zv, weights = res
    g_feat, g_bg, g_depth = g
    bwd_tile = min(tile_rays, 64)   # tile 64 measured fastest on v5e with
    # the interleaved-dW kernel (18.0 ms fwd+bwd at Reso64 paired with fwd
    # tile 256); tile 128 exceeds VMEM (stashed activations alone = 48 MB)
    return fused_render_bwd(
        pe, zd, zv, weights, g_feat, g_bg, g_depth,
        tile_rays=bwd_tile, compute_dtype=compute_dtype, interpret=interpret,
        input_grads=input_grads,
    )


def _fused_render_b_remat(tile_rays, compute_dtype, interpret, input_grads,
                          res, g):
    """Fallback backward: jax.vjp over the jnp oracle (rematerialized)."""
    pe, zd, zv, weights = res
    _, vjp = jax.vjp(
        lambda p, d, z, w: reference_render(p, d, z, w, compute_dtype=compute_dtype),
        pe, zd, zv, weights,
    )
    return vjp(g)


fused_render.defvjp(_fused_render_f, _fused_render_b)


# ------------------------------------------------------- multi-chip (SPMD)
#
# shard_map composition of the fused kernel with a device mesh
# (SURVEY.md §2.9 P6): per-ray work is embarrassingly parallel, so the
# forward shards [B, R, ...] arrays over (data, rays) with the shared MLP
# weights replicated and the per-batch folded biases (b0/b5/br1) sharded
# over "data". The backward runs the same per-shard Pallas kernel and
# psums the weight cotangents over the mesh — shared weights over both
# axes, per-batch biases over "rays" only — the same compute+collective
# pattern as parallel/partial_fc.py.

_PER_BATCH_KEYS = ("b0", "b5", "br1")


def _largest_tile(r: int, tile: int) -> int:
    while r % tile:
        tile //= 2
    return tile


def _spmd_specs(weights, data_axis, rays_axis):
    from jax.sharding import PartitionSpec as P

    ray = P(data_axis, rays_axis)
    wspec = {k: (P(data_axis) if k in _PER_BATCH_KEYS else P())
             for k in weights}
    return ray, wspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_render_spmd(pe, z_dists, zvals, weights, mesh,
                      axis_names=("data", "rays"), tile_rays=256,
                      compute_dtype=jnp.bfloat16, interpret=False,
                      input_grads=True):
    """`fused_render` sharded over a (data, rays) mesh via shard_map.

    Inputs are global-view [B, R, ...] arrays (B divisible by the data
    axis, R by the rays axis); per-shard ray tiles are re-derived from the
    local shapes. Differentiable w.r.t. pe/z-geometry/weights exactly like
    `fused_render`; weight grads arrive fully reduced (psum over ICI
    inside the backward shard_map, overlapped with the rest of the
    backward by XLA's scheduler).
    """
    return _spmd_fwd_call(pe, z_dists, zvals, weights, mesh, axis_names,
                          tile_rays, compute_dtype, interpret)


def _spmd_fwd_call(pe, zd, zv, weights, mesh, axes, tile, cdt, interp):
    da, ra = axes
    ray, wspec = _spmd_specs(weights, da, ra)

    def body(pe_l, zd_l, zv_l, w_l):
        t = _largest_tile(pe_l.shape[1], tile)
        return fused_render_fwd(
            pe_l, zd_l, zv_l, w_l,
            tile_rays=t, compute_dtype=cdt, interpret=interp,
        )

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(ray, ray, ray, wspec),
        out_specs=(ray, ray, ray),
        check_vma=False,
    )
    return f(pe, zd, zv, weights)


def _spmd_f(pe, zd, zv, weights, mesh, axes, tile, cdt, interp, input_grads):
    out = _spmd_fwd_call(pe, zd, zv, weights, mesh, axes, tile, cdt, interp)
    return out, (pe, zd, zv, weights)


def _spmd_b(mesh, axes, tile, cdt, interp, input_grads, res, g):
    da, ra = axes
    pe, zd, zv, weights = res
    g_feat, g_bg, g_depth = g
    ray, wspec = _spmd_specs(weights, da, ra)
    dw_spec = {k: v for k, v in wspec.items()}  # same layout as the primals

    def body(pe_l, zd_l, zv_l, w_l, gf, gb, gd):
        t = _largest_tile(pe_l.shape[1], min(tile, 64))
        d_pe, d_zd, d_zv, dw = fused_render_bwd(
            pe_l, zd_l, zv_l, w_l, gf, gb, gd,
            tile_rays=t, compute_dtype=cdt, interpret=interp,
            input_grads=input_grads,
        )
        dw = {
            k: (jax.lax.psum(v, ra) if k in _PER_BATCH_KEYS
                else jax.lax.psum(v, (da, ra)))
            for k, v in dw.items()
        }
        return d_pe, d_zd, d_zv, dw

    b = jax.shard_map(
        body, mesh=mesh,
        in_specs=(ray, ray, ray, wspec, ray, ray, ray),
        out_specs=(ray, ray, ray, dw_spec),
        check_vma=False,
    )
    return b(pe, zd, zv, weights, g_feat, g_bg, g_depth)


fused_render_spmd.defvjp(_spmd_f, _spmd_b)
