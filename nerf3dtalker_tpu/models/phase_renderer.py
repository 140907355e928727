"""Phase-stacked reformulation of the NeuralRenderer upsampler.

The reference decoder (NetWorks/neural_renderer.py:72-91 +
PixelShuffleUpsample.py:29-45) interleaves pointwise convs with
pixel-shuffles, blurs and bilinear 2x upsamples over growing spatial grids
(64 -> 128 -> 256 -> 512). On TPU the spatial ops force layout changes
(6-D transposes for pixel-shuffle, pad/shift chains for the stencils)
between every matmul, each costing an HBM round trip.

This module re-expresses the whole decoder on a FIXED 64x64 coarse grid: a
fine image at level l is a stack of 4^l phase planes
``X[pr, pc, i, j, c] = img[i * 2^l + pr, j * 2^l + pc, c]``.
In this representation:

  * pixel-shuffle is a pure relabeling (lane block -> phase plane);
  * the 3x3 binomial blur and the half-pixel bilinear 2x become
    phase-mixing adds with +-1 COARSE shifts (reflect/clamp boundaries
    turn into single-row fixups);
  * every Dense layer is one big ``[P*N, C]`` matmul — ideal MXU shape;
  * the tiled-identity path of PixelShuffleUpsample becomes a constant
    0/1 matrix ``T_pm`` folded into the matmul stream.

The body is pure jnp, so the same function runs under XLA (used for
verification and as the CPU path) and inside the Pallas fused-upsampler
kernel (ops/pallas/fused_upsampler.py) on VMEM-resident values.

Phase bookkeeping: flat phase p = pr * 2^l + pc; upsampling maps
pr' = 2*pr + di (so fine row u = i * 2^l + pr exactly).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def leaky_relu(x, slope=0.2):
    # comparison in f32: Mosaic on this toolchain rejects bf16 cmpf
    # ("Target does not support this comparison")
    return jnp.where(x.astype(jnp.float32) >= 0, x, slope * x)


# --------------------------------------------------------------- constants


@functools.lru_cache(maxsize=None)
def _tile_pm_np(C: int) -> np.ndarray:
    """Phase-major tile matrix: T[c_x, p*C + c] = 1 iff c_x == (4c+p) mod C.

    ``x @ T`` equals the channel-tiled identity ``x.repeat(4)`` of
    PixelShuffleUpsample (torch repeat(1,4,1,1), channel k = m*C + c_x)
    re-read through the pixel-shuffle decomposition k = c*4 + p and
    permuted to phase-major lane order q = p*C + c.
    """
    T = np.zeros((C, 4 * C), np.float32)
    for p in range(4):
        for c in range(C):
            T[(4 * c + p) % C, p * C + c] = 1.0
    return T


def permute_w2_phase_major(w2: jnp.ndarray, b2: jnp.ndarray):
    """Reorder D2's output channels from torch ps order (c*4 + p) to
    phase-major (p*C + c) so the pixel-shuffle becomes a lane-block split."""
    C4 = w2.shape[1]
    C = C4 // 4
    q = np.arange(C4)
    src = (q % C) * 4 + (q // C)          # origin column for position q
    return w2[:, src], b2[src]


# ----------------------------------------------------- phase-space stencils


def _shift_m1(X: jnp.ndarray, axis_p: int, axis_s: int, L: int, mode: str):
    """Value of the fine-neighbor "f-1" for every phase plane.

    X: [..., P_dim at axis_p ..., coarse spatial at axis_s ...].
    Returns A with A[pr] = X[pr-1] for pr >= 1 and
    A[0] = coarse-shifted X[L-1] whose first coarse row is filled per
    ``mode``: 'reflect' -> fine row 1 (= X[min(1, L-1)] row 0),
    'clamp' -> fine row 0 (= X[0] row 0).
    """
    # pr = 0 plane: coarse shift down of X[L-1] (row i gets X[L-1] row i-1)
    top_plane = jax.lax.slice_in_dim(X, L - 1, L, axis=axis_p)
    shifted = jax.lax.slice_in_dim(top_plane, 0, -1, axis=axis_s)
    if mode == "reflect":
        # fine row -1 reflects to fine row 1 = (phase 1, coarse row 0)
        fill_plane = jax.lax.slice_in_dim(X, min(1, L - 1), min(1, L - 1) + 1,
                                          axis=axis_p)
    else:  # clamp: fine row -1 -> fine row 0 = (phase 0, coarse row 0)
        fill_plane = jax.lax.slice_in_dim(X, 0, 1, axis=axis_p)
    fill = jax.lax.slice_in_dim(fill_plane, 0, 1, axis=axis_s)
    plane0 = jnp.concatenate([fill, shifted], axis=axis_s)
    if L == 1:
        return plane0
    # interior phases: X[pr-1] (size-0 slices are illegal in Mosaic)
    body = jax.lax.slice_in_dim(X, 0, L - 1, axis=axis_p)
    return jnp.concatenate([plane0, body], axis=axis_p)


def _shift_p1(X: jnp.ndarray, axis_p: int, axis_s: int, L: int, mode: str):
    """Fine-neighbor "f+1": B[pr] = X[pr+1] for pr < L-1; B[L-1] = coarse
    shift up of X[0] with the last coarse row filled per ``mode``
    ('reflect' -> fine F-2 = (phase L-2, last row); 'clamp' -> fine F-1)."""
    n_s = X.shape[axis_s]
    bot_plane = jax.lax.slice_in_dim(X, 0, 1, axis=axis_p)
    shifted = jax.lax.slice_in_dim(bot_plane, 1, n_s, axis=axis_s)
    if mode == "reflect":
        fill_plane = jax.lax.slice_in_dim(X, max(L - 2, 0), max(L - 2, 0) + 1,
                                          axis=axis_p)
    else:
        fill_plane = jax.lax.slice_in_dim(X, L - 1, L, axis=axis_p)
    fill = jax.lax.slice_in_dim(fill_plane, n_s - 1, n_s, axis=axis_s)
    planeL = jnp.concatenate([shifted, fill], axis=axis_s)
    if L == 1:
        return planeL
    body = jax.lax.slice_in_dim(X, 1, L, axis=axis_p)
    return jnp.concatenate([body, planeL], axis=axis_p)


def phase_blur3(X: jnp.ndarray, l: int) -> jnp.ndarray:
    """Separable [1,2,1]/4 x [1,2,1]/4 blur with reflect boundary on the
    level-l fine grid, on a phase stack [Pr, Pc, Hc, Wc, C]."""
    L = 1 << l
    A = _shift_m1(X, 0, 2, L, "reflect")
    Bv = _shift_p1(X, 0, 2, L, "reflect")
    X = (A + 2.0 * X + Bv) * 0.25
    A = _shift_m1(X, 1, 3, L, "reflect")
    Bh = _shift_p1(X, 1, 3, L, "reflect")
    return (A + 2.0 * X + Bh) * 0.25


def phase_bilinear2x(X: jnp.ndarray, l: int) -> jnp.ndarray:
    """Half-pixel bilinear 2x (torch align_corners=False semantics) from
    level l to l+1: [Pr, Pc, Hc, Wc, C] -> [2Pr, 2Pc, Hc, Wc, C].

    out[2f]   = 0.75 in[f] + 0.25 in[f-1]
    out[2f+1] = 0.75 in[f] + 0.25 in[f+1], edges clamped.
    """
    L = 1 << l

    def axis_double(Y, axis_p, axis_s):
        A = _shift_m1(Y, axis_p, axis_s, L, "clamp")
        B = _shift_p1(Y, axis_p, axis_s, L, "clamp")
        even = 0.75 * Y + 0.25 * A      # new phase bit 0
        odd = 0.75 * Y + 0.25 * B       # new phase bit 1
        # interleave: pr' = 2*pr + s
        st = jnp.stack([even, odd], axis=axis_p + 1)
        shp = list(Y.shape)
        shp[axis_p] *= 2
        return st.reshape(shp)

    X = axis_double(X, 0, 2)
    return axis_double(X, 1, 3)


def phase_split(z: jnp.ndarray, l: int) -> jnp.ndarray:
    """Pixel shuffle as phase relabeling: [Pr, Pc, Hc, Wc, 4C] phase-major
    lanes (q = (di*2+dj)*C + c) -> [2Pr, 2Pc, Hc, Wc, C].

    Implemented as four static lane slices + stacks/reshapes on the
    leading (untiled) phase axes — Mosaic cannot lower a lane-dim split
    reshape ('infer-vector-layout: unsupported shape cast'), but static
    lane slices and leading-axis interleaves are fine, and the same form
    is equivalent (and equally fused) under plain XLA."""
    Pr, Pc, Hc, Wc, C4 = z.shape
    C = C4 // 4
    parts = [
        jax.lax.slice_in_dim(z, p * C, (p + 1) * C, axis=4) for p in range(4)
    ]
    # out[2*pr+di, 2*pc+dj] = parts[2*di+dj][pr, pc]
    def row(a, b):  # interleave dj next to Pc
        st = jnp.stack([a, b], axis=2)           # [Pr, Pc, 2, Hc, Wc, C]
        return st.reshape(Pr, 2 * Pc, Hc, Wc, C)

    r0 = row(parts[0], parts[1])
    r1 = row(parts[2], parts[3])
    out = jnp.stack([r0, r1], axis=1)            # [Pr, 2, 2Pc, Hc, Wc, C]
    return out.reshape(2 * Pr, 2 * Pc, Hc, Wc, C)


def unstack_phases(X: jnp.ndarray) -> jnp.ndarray:
    """[Pr, Pc, Hc, Wc, C] -> full image [Hc*Pr, Wc*Pc, C]."""
    Pr, Pc, Hc, Wc, C = X.shape
    x = X.transpose(2, 0, 3, 1, 4)               # [Hc, Pr, Wc, Pc, C]
    return x.reshape(Hc * Pr, Wc * Pc, C)


def stack_phases(img: jnp.ndarray, l: int) -> jnp.ndarray:
    """Inverse of :func:`unstack_phases` for a level-l image."""
    L = 1 << l
    H, W, C = img.shape
    x = img.reshape(H // L, L, W // L, L, C)
    return x.transpose(1, 3, 0, 2, 4)


# ------------------------------------------------------------------ params


def extract_phase_params(nr_params: Dict, n_blocks: int) -> Dict:
    """Flatten a NeuralRenderer flax param tree into the phase-kernel layout
    (D2 kernels/biases pre-permuted to phase-major)."""
    p = nr_params["params"] if "params" in nr_params else nr_params
    out = {}
    for i in range(n_blocks):
        up = p[f"feat_upsample_{i}"]
        out[f"w1_{i}"] = up["layer_1"]["kernel"]
        out[f"b1_{i}"] = up["layer_1"]["bias"]
        w2pm, b2pm = permute_w2_phase_major(
            up["layer_2"]["kernel"], up["layer_2"]["bias"]
        )
        out[f"w2pm_{i}"] = w2pm
        out[f"b2pm_{i}"] = b2pm
        out[f"wf_{i}"] = p[f"feat_layer_{i}"]["kernel"]
        out[f"bf_{i}"] = p[f"feat_layer_{i}"]["bias"]
    for i in range(n_blocks + 1):
        out[f"wr_{i}"] = p[f"feat_2_rgb_{i}"]["kernel"]
        out[f"br_{i}"] = p[f"feat_2_rgb_{i}"]["bias"]
    return out


# ----------------------------------------------------------------- forward


def _mm(a, w, b, cdt):
    out = jax.lax.dot_general(
        a.astype(cdt).reshape(-1, a.shape[-1]), w.astype(cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    return out.astype(cdt).reshape(*a.shape[:-1], w.shape[1])


def block_params(pp: Dict, i: int) -> Dict:
    keys = [f"w1_{i}", f"b1_{i}", f"w2pm_{i}", f"b2pm_{i}",
            f"wf_{i}", f"bf_{i}", f"wr_{i+1}", f"br_{i+1}"]
    if i == 0:
        keys += ["wr_0", "br_0"]
    return {k: pp[k] for k in keys}


def phase_block_forward(
    net: jnp.ndarray,                 # [Pr, Pc, Hc, Wc, C] level-i features
    rgb: jnp.ndarray,                 # [Pr, Pc, Hc, Wc, 3] level-i rgb acc
    bp: Dict,                         # block_params(pp, i)
    i: int,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One upsampler block in phase space: level i -> level i+1.

    For i == 0 the rgb input is ignored and rgb_0 = wr_0(net) is computed
    here (neural_renderer.py:72-74). Order matches the reference loop: the
    rgb accumulator is bilinear+blur upsampled at the START of each block
    (the trailing upsample of the previous reference iteration), then the
    new level's contribution is added.
    """
    cdt = compute_dtype
    net = net.astype(cdt)
    if i == 0:
        rgb = _mm(net, bp["wr_0"], bp["br_0"], cdt)
    rgbup = phase_blur3(phase_bilinear2x(rgb.astype(cdt), i), i + 1)

    c = net.shape[-1]
    h = leaky_relu(_mm(net, bp[f"w1_{i}"], bp[f"b1_{i}"], cdt))
    h = leaky_relu(_mm(h, bp[f"w2pm_{i}"], bp[f"b2pm_{i}"], cdt))
    tile = jax.lax.dot_general(
        net.reshape(-1, c), jnp.asarray(_tile_pm_np(c), cdt),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(cdt).reshape(*net.shape[:-1], 4 * c)
    up = phase_blur3(phase_split(h + tile, i), i + 1)
    net_next = leaky_relu(_mm(up, bp[f"wf_{i}"], bp[f"bf_{i}"], cdt))
    rgb_next = rgbup + _mm(net_next, bp[f"wr_{i+1}"], bp[f"br_{i+1}"], cdt)
    return net_next, rgb_next


def phase_renderer_forward(
    x: jnp.ndarray,                   # [Hc, Wc, C] featmap (one image)
    pp: Dict,                         # extract_phase_params output
    n_blocks: int,
    compute_dtype=jnp.float32,
    final_actvn: bool = True,
) -> jnp.ndarray:
    """Full NeuralRenderer forward in phase space. Returns [img, img, 3].

    Matches models/neural_renderer.py NeuralRenderer.__call__ bit-for-bit
    in f32 (tested); in bf16 it differs only by op-order rounding.
    """
    net = x[None, None]                                # [1, 1, Hc, Wc, C]
    rgb = jnp.zeros(net.shape[:-1] + (3,), compute_dtype)
    for i in range(n_blocks):
        net, rgb = phase_block_forward(
            net, rgb, block_params(pp, i), i, compute_dtype
        )
    img = unstack_phases(rgb.astype(jnp.float32))
    if final_actvn:
        img = jax.nn.sigmoid(img)
    return img
