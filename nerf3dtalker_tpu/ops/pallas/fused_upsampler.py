"""Fused Pallas kernels for the NeuralRenderer upsampler decoder.

One kernel per PixelShuffleUpsample block (reference
NetWorks/neural_renderer.py:72-91), executing the phase-stacked
formulation of models/phase_renderer.py entirely in VMEM: the Dense
chain, tiled-identity, pixel-shuffle (a relabeling), 3x3 blur and the
rgb bilinear+blur pyramid never round-trip HBM between ops. Under XLA
the same math costs ~2.8 ms fwd+bwd per pass at Reso64 (measured, mostly
layout changes and small-fusion traffic); the floor is ~0.6 ms.

Grid layout: (batch, row-strips). Each strip computes R coarse output
rows from a (R + 2*HALO)-row window of the full VMEM-resident inputs.
Stencil boundary fills (reflect for blur, clamp for bilinear) are only
correct at true image edges; interior windows discard HALO corrupted
rows on each side — HALO = 2 covers the two stencil layers per block
(bilinear+blur on the rgb path, blur on the net path).

Backward: a mirrored kernel whose body is ``jax.vjp`` of the SAME
forward body (traced inside the kernel, so the transpose ops also stay
in VMEM); weight grads accumulate in persistent VMEM outputs across grid
steps, input grads are emitted as per-strip windows and overlap-added in
XLA (windows overlap by 2*HALO rows).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf3dtalker_tpu.models.phase_renderer import (
    _tile_pm_np,
    phase_block_forward,
)

HALO = 2

_WKEYS = ("w1", "b1", "w2pm", "b2pm", "wf", "bf", "wr", "br")


def _block_weight_list(bw: Dict, i: int):
    """Flatten the block-i weight dict to a fixed arg order; biases 2-D."""
    arrs = []
    for k in _WKEYS:
        idx = i + 1 if k in ("wr", "br") else i
        arrs.append(bw[f"{k}_{idx}"])
    if i == 0:
        arrs += [bw["wr_0"], bw["br_0"]]
    c = bw[f"w1_{i}"].shape[0]
    arrs.append(jnp.asarray(_tile_pm_np(c)))
    return [a[None] if a.ndim == 1 else a for a in arrs]


def _rebuild_bp(i: int, wvals):
    bp = {}
    names = [f"w1_{i}", f"b1_{i}", f"w2pm_{i}", f"b2pm_{i}",
             f"wf_{i}", f"bf_{i}", f"wr_{i+1}", f"br_{i+1}"]
    if i == 0:
        names += ["wr_0", "br_0"]
    names.append("_tile")
    for n, v in zip(names, wvals):
        bp[n] = v[0] if (n.startswith("b") and v.shape[0] == 1) else v
    return bp


def _strip_geometry(t, R: int, Hc: int):
    """Window start and output offset for strip t (all jnp on traced t)."""
    W = min(Hc, R + 2 * HALO)
    ws = jnp.clip(t * R - HALO, 0, Hc - W)
    off = t * R - ws
    return ws, off, W


def _static_geometry(tt: int, R: int, Hc: int):
    """Static twin of :func:`_strip_geometry` for a concrete strip index —
    Mosaic cannot dynamic-slice *values*, so output writes branch over the
    (small) strip count with static offsets."""
    W = min(Hc, R + 2 * HALO)
    ws = int(np.clip(tt * R - HALO, 0, Hc - W))
    return ws, tt * R - ws, W


def _forward_body(i, cdt, net_w, rgb_w, bp):
    """phase_block_forward with the tile matrix taken from bp (constant)."""
    import nerf3dtalker_tpu.models.phase_renderer as PR

    tile_const = bp["_tile"]
    orig = PR._tile_pm_np

    # phase_block_forward builds the tile matrix via _tile_pm_np; inside
    # the kernel we substitute the prefetched constant (same values).
    class _Sub:
        def __call__(self, C):
            return tile_const

    PR._tile_pm_np = _Sub()
    try:
        out = phase_block_forward(
            net_w, rgb_w, {k: v for k, v in bp.items() if k != "_tile"},
            i, cdt,
        )
    finally:
        PR._tile_pm_np = orig
    return out


def _fwd_kernel(net_ref, rgb_ref, *refs, i, R, Hc, cdt, n_w):
    wrefs = refs[:n_w]
    net_out_ref, rgb_out_ref = refs[n_w:]
    t = pl.program_id(1)
    ws, off, W = _strip_geometry(t, R, Hc)

    P = net_ref.shape[1]
    L = int(round(P ** 0.5))
    net_w = net_ref[0, :, pl.ds(ws, W)]
    net_w = net_w.reshape(L, L, *net_w.shape[1:])
    if rgb_ref is not None:
        rgb_w = rgb_ref[0, :, pl.ds(ws, W)]
        rgb_w = rgb_w.reshape(L, L, *rgb_w.shape[1:])
    else:
        rgb_w = jnp.zeros(net_w.shape[:-1] + (3,), cdt)

    bp = _rebuild_bp(i, [w[...] for w in wrefs])
    net_n, rgb_n = _forward_body(i, cdt, net_w, rgb_w, bp)

    net_n = net_n.reshape(4 * P, *net_n.shape[2:])
    rgb_n = rgb_n.reshape(4 * P, *rgb_n.shape[2:])
    T = Hc // R
    for tt in range(T):
        _, off_t, _ = _static_geometry(tt, R, Hc)

        @pl.when(t == tt)
        def _(off_t=off_t):
            net_out_ref[0] = net_n[:, off_t:off_t + R]
            rgb_out_ref[0] = rgb_n[:, off_t:off_t + R]


def _bwd_kernel(net_ref, rgb_ref, gnet_n_ref, grgb_n_ref, *refs,
                i, R, Hc, cdt, n_w):
    wrefs = refs[:n_w]
    outs = refs[n_w:]
    gnet_out, grgb_out = outs[0], outs[1]
    gw_refs = outs[2:]
    b_idx = pl.program_id(0)
    t = pl.program_id(1)
    ws, off, W = _strip_geometry(t, R, Hc)

    P = net_ref.shape[1]
    L = int(round(P ** 0.5))
    net_w = net_ref[0, :, pl.ds(ws, W)].reshape(L, L, W, -1, net_ref.shape[-1])
    if rgb_ref is not None:
        rgb_w = rgb_ref[0, :, pl.ds(ws, W)].reshape(L, L, W, -1, 3)
    else:
        rgb_w = jnp.zeros(net_w.shape[:-1] + (3,), cdt)

    bp = _rebuild_bp(i, [w[...] for w in wrefs])
    wkeys = [k for k in bp if k != "_tile"]

    def f(net_in, rgb_in, wd):
        return _forward_body(i, cdt, net_in, rgb_in, {**wd, "_tile": bp["_tile"]})

    _, vjp_fn = jax.vjp(f, net_w, rgb_w, {k: bp[k] for k in wkeys})

    # pad the strip cotangents into full windows (halo rows get zeros);
    # Mosaic cannot dynamic-update-slice values, so select among the T
    # static placements (halo padding is cheap: two zero concats)
    T = Hc // R
    W_ = net_w.shape[2]

    def pad_ct(g_strip, C):
        gs = g_strip[0].reshape(2 * L, 2 * L, R, g_strip.shape[-2], C)
        if W_ == R:
            return gs

        def place(off_t):
            # zero-size concat operands are illegal in Mosaic
            parts = []
            if off_t > 0:
                parts.append(jnp.zeros(
                    (2 * L, 2 * L, off_t, gs.shape[-2], C), gs.dtype))
            parts.append(gs)
            if W_ - R - off_t > 0:
                parts.append(jnp.zeros(
                    (2 * L, 2 * L, W_ - R - off_t, gs.shape[-2], C), gs.dtype))
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)

        offsets = sorted({_static_geometry(tt, R, Hc)[1] for tt in range(T)})
        out = place(offsets[0])
        for off_t in offsets[1:]:
            out = jnp.where(off == off_t, place(off_t), out)
        return out

    g_net_n = pad_ct(gnet_n_ref[...], gnet_n_ref.shape[-1])
    g_rgb_n = pad_ct(grgb_n_ref[...], 3)
    g_net_w, g_rgb_w, g_wd = vjp_fn((g_net_n, g_rgb_n))

    gnet_out[0, 0] = g_net_w.reshape(P, W, -1, net_ref.shape[-1]).astype(
        jnp.float32
    )
    if rgb_ref is not None:
        grgb_out[0, 0] = g_rgb_w.reshape(P, W, -1, 3).astype(jnp.float32)

    first = (b_idx == 0) & (t == 0)

    @pl.when(first)
    def _():
        for ref in gw_refs:
            ref[...] = jnp.zeros_like(ref)

    names = [f"w1_{i}", f"b1_{i}", f"w2pm_{i}", f"b2pm_{i}",
             f"wf_{i}", f"bf_{i}", f"wr_{i+1}", f"br_{i+1}"]
    if i == 0:
        names += ["wr_0", "br_0"]
    for ref, n in zip(gw_refs, names):
        g = g_wd[n].astype(jnp.float32)
        ref[...] += g[None] if g.ndim == 1 else g


def _vmem_params():
    # 120M of the 128M device VMEM: the block-2 backward's scoped
    # allocation peaks at ~110.2M even at 2-row strips
    return pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


def _io_dtype(cdt):
    return jnp.bfloat16 if cdt == jnp.bfloat16 else jnp.float32


@functools.partial(
    jax.jit, static_argnames=("i", "R", "cdt_name", "interpret")
)
def _fwd_call(net, rgb, wlist, i, R, cdt_name, interpret):
    cdt = jnp.bfloat16 if cdt_name == "bfloat16" else jnp.float32
    iodt = _io_dtype(cdt)
    B, P, Hc, Wc, C = net.shape
    Cn = wlist[4].shape[1]            # wf out features
    T = max(Hc // R, 1)
    Rr = Hc if T == 1 else R

    def full_spec(a):
        return pl.BlockSpec(
            (1,) + a.shape[1:], lambda b, t: (b,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    def const_spec(a):
        return pl.BlockSpec(
            a.shape, lambda b, t: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

    out_specs = [
        pl.BlockSpec((1, 4 * P, Rr, Wc, Cn), lambda b, t: (b, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 * P, Rr, Wc, 3), lambda b, t: (b, 0, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, 4 * P, Hc, Wc, Cn), iodt),
        jax.ShapeDtypeStruct((B, 4 * P, Hc, Wc, 3), iodt),
    ]
    args = [net] + ([] if rgb is None else [rgb]) + list(wlist)
    in_specs = [full_spec(net)]
    if rgb is not None:
        in_specs.append(full_spec(rgb))
    in_specs += [const_spec(w) for w in wlist]

    kern = functools.partial(
        _fwd_kernel, i=i, R=Rr, Hc=Hc, cdt=cdt, n_w=len(wlist)
    )
    if rgb is None:
        def kern2(net_ref, *refs, _k=kern):
            _k(net_ref, None, *refs)
        body = kern2
    else:
        body = kern
    return pl.pallas_call(
        body,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("i", "R", "cdt_name", "interpret")
)
def _bwd_call(net, rgb, g_net_n, g_rgb_n, wlist, i, R, cdt_name, interpret):
    cdt = jnp.bfloat16 if cdt_name == "bfloat16" else jnp.float32
    iodt = _io_dtype(cdt)
    B, P, Hc, Wc, C = net.shape
    T = max(Hc // R, 1)
    Rr = Hc if T == 1 else R
    W = min(Hc, Rr + 2 * HALO)
    Cn = g_net_n.shape[-1]

    def full_spec(a):
        return pl.BlockSpec(
            (1,) + a.shape[1:], lambda b, t: (b,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    def const_spec(a):
        return pl.BlockSpec(
            a.shape, lambda b, t: (0,) * a.ndim, memory_space=pltpu.VMEM
        )

    def strip_spec(C_):
        return pl.BlockSpec((1, 4 * P, Rr, Wc, C_),
                            lambda b, t: (b, 0, t, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [full_spec(net)]
    args = [net]
    if rgb is not None:
        in_specs.append(full_spec(rgb))
        args.append(rgb)
    in_specs += [strip_spec(Cn), strip_spec(3)]
    args += [g_net_n, g_rgb_n]
    in_specs += [const_spec(w) for w in wlist]
    args += list(wlist)

    # per-strip window grads (overlap-added outside) + weight-grad accums
    out_specs = [
        pl.BlockSpec((1, 1, P, W, Wc, C), lambda b, t: (b, t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P, W, Wc, 3), lambda b, t: (b, t, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, T, P, W, Wc, C), jnp.float32),
        jax.ShapeDtypeStruct((B, T, P, W, Wc, 3), jnp.float32),
    ]
    n_wg = len(wlist) - 1             # no grad for the tile constant
    for w in wlist[:n_wg]:
        out_specs.append(const_spec(w))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))

    kern = functools.partial(
        _bwd_kernel, i=i, R=Rr, Hc=Hc, cdt=cdt, n_w=len(wlist)
    )
    if rgb is None:
        def kern2(net_ref, gnet_ref, grgb_ref, *refs, _k=kern):
            _k(net_ref, None, gnet_ref, grgb_ref, *refs)
        body = kern2
    else:
        body = kern
    outs = pl.pallas_call(
        body,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(*args)
    g_net_windows, g_rgb_windows = outs[0], outs[1]
    gw = outs[2:]

    def overlap_add(wind):
        # wind: [B, T, P, W, Wc, C] -> [B, P, Hc, Wc, C]
        Bq, Tq, Pq, Wq, Wcq, Cq = wind.shape
        total = jnp.zeros((Bq, Pq, Hc, Wcq, Cq), wind.dtype)
        for tt in range(Tq):
            ws = int(np.clip(tt * Rr - HALO, 0, Hc - Wq))
            total = jax.lax.dynamic_update_slice_in_dim(
                total,
                jax.lax.dynamic_slice_in_dim(total, ws, Wq, axis=2)
                + wind[:, tt],
                ws, axis=2,
            )
        return total

    g_net = overlap_add(g_net_windows)
    g_rgb = overlap_add(g_rgb_windows) if rgb is not None else None
    return g_net, g_rgb, list(gw)


# ------------------------------------------------------- differentiable API


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def phase_block_apply(net, rgb, bw_list, i, R, cdt_name, interpret=False):
    """Differentiable fused upsampler block (level i -> i+1).

    net: [B, P, Hc, Wc, C] phase-stacked features, rgb: [B, P, Hc, Wc, 3]
    (pass zeros for i == 0 — it is ignored), bw_list: weight list from
    :func:`block_weight_list`. Returns (net_next, rgb_next) with 4P phases.
    """
    rgb_in = None if i == 0 else rgb
    return _fwd_call(net, rgb_in, tuple(bw_list), i, R, cdt_name, interpret)


def block_weight_list(pp: Dict, i: int):
    return _block_weight_list(pp, i)


def _pba_fwd(net, rgb, bw_list, i, R, cdt_name, interpret):
    out = phase_block_apply(net, rgb, bw_list, i, R, cdt_name, interpret)
    return out, (net, rgb, bw_list)


def _pba_bwd(i, R, cdt_name, interpret, res, g):
    net, rgb, bw_list = res
    g_net_n, g_rgb_n = g
    iodt = _io_dtype(jnp.bfloat16 if cdt_name == "bfloat16" else jnp.float32)
    rgb_in = None if i == 0 else rgb
    # the vjp body holds fwd residuals + cotangents per strip, roughly
    # doubling live VMEM vs the forward — halve the strip rows
    g_net, g_rgb, gw = _bwd_call(
        net, rgb_in, g_net_n.astype(iodt), g_rgb_n.astype(iodt),
        tuple(bw_list), i, max(R // 2, 1), cdt_name, interpret,
    )
    if g_rgb is None:
        g_rgb = jnp.zeros_like(rgb)
    # match bw_list structure: grads for all but the trailing tile constant
    gw_full = [
        (gq.reshape(w.shape) if gq.shape != w.shape else gq).astype(w.dtype)
        for gq, w in zip(gw, bw_list[: len(gw)])
    ] + [jnp.zeros_like(bw_list[-1])]
    return g_net.astype(net.dtype), g_rgb.astype(rgb.dtype), gw_full


phase_block_apply.defvjp(_pba_fwd, _pba_bwd)


def fused_upsampler(
    x: jnp.ndarray,                   # [B, Hc, Wc, C] featmap
    pp: Dict,                         # extract_phase_params output
    n_blocks: int,
    compute_dtype=jnp.bfloat16,
    final_actvn: bool = True,
    strip_rows: Tuple[int, ...] = (16, 8, 4),
    interpret: bool = False,
) -> jnp.ndarray:
    """Full fused decoder: featmap -> [B, img, img, 3]."""
    cdt_name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    iodt = _io_dtype(compute_dtype)
    B, Hc, Wc, C = x.shape
    net = x.astype(iodt)[:, None]                  # [B, 1, Hc, Wc, C]
    rgb = jnp.zeros((B, 1, Hc, Wc, 3), iodt)
    for i in range(n_blocks):
        wl = block_weight_list(pp, i)
        R = strip_rows[i] if i < len(strip_rows) else strip_rows[-1]
        net, rgb = phase_block_apply(net, rgb, wl, i, R, cdt_name, interpret)
    # unstack phases: [B, P, Hc, Wc, 3] -> [B, Hc*L, Wc*L, 3]
    P = rgb.shape[1]
    L = int(round(P ** 0.5))
    r = rgb.astype(jnp.float32).reshape(B, L, L, Hc, Wc, 3)
    img = r.transpose(0, 3, 1, 4, 2, 5).reshape(B, Hc * L, Wc * L, 3)
    if final_actvn:
        img = jax.nn.sigmoid(img)
    return img
