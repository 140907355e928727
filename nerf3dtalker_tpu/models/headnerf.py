"""The audio-conditioned HeadNeRF model.

Functional equivalent of reference `HeadNeRFNet`
(NetWorks/HeadNeRFNet.py:10-207): rays -> stratified samples -> positional
encoding -> point MLP -> alpha compositing to a `[B, S, S, feat_nc]` feature
map -> neural-render upsampling to the output image, with the background
handled as `fg_feat + bg_alpha * bg_featmap` (HeadNeRFNet.py:108-113).

The whole forward is one pure jittable function of (params, inputs, rng);
sharding is applied from the outside (see nerf3dtalker_tpu.parallel).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf3dtalker_tpu.config import NeRFConfig
from nerf3dtalker_tpu.models.nerf_mlp import NeRFMLP
from nerf3dtalker_tpu.models.neural_renderer import NeuralRenderer
from nerf3dtalker_tpu.ops.embedding import (
    positional_encoding,
    positional_encoding_rays,
)
from nerf3dtalker_tpu.ops.compositing import alpha_composite
from nerf3dtalker_tpu.ops.rays import (
    Rays,
    fine_zvals,
    gen_rays,
    sample_points,
    stratified_zvals,
)


class HeadNeRF(nn.Module):
    cfg: NeRFConfig
    compute_dtype: jnp.dtype = jnp.float32
    # Route PE+MLP+compositing through the fused Pallas kernel
    # (ops/pallas/fused_render.py). Falls back to the jnp path when the
    # config doesn't match the kernel's compiled constants.
    use_fused: bool = False
    fused_interpret: bool = False   # interpreter mode (CPU tests)
    # When False, the fused backward skips d_pe/d_zd/d_zv (their HBM writes
    # cannot be DCE'd out of a pallas_call) — set by the parameter-only
    # training step; MUST stay True when differentiating w.r.t. cameras or
    # ray geometry (the fitting drivers).
    fused_input_grads: bool = True
    # Route the NeuralRenderer decoder through the fused phase-stacked
    # Pallas kernels (ops/pallas/fused_upsampler.py).
    use_fused_upsampler: bool = False
    # Device mesh for the SPMD fused path (fused_render_spmd: shard_map
    # over (data, rays) with psum'd weight grads). None = single device.
    fused_mesh: object = None

    @property
    def _fused_ok(self) -> bool:
        cfg = self.cfg
        if (
            not self.use_fused
            or cfg.include_vd
            or cfg.hier_sampling
            or cfg.include_gaze
        ):
            return False
        if self.fused_interpret:
            # the kernels derive all dims from the input shapes, so any
            # config runs under the interpreter (CPU tests / dryrun)
            return True
        from nerf3dtalker_tpu.ops.pallas import fused_render as fr

        # compiled Mosaic path: require the lane-aligned flagship dims
        return (
            cfg.mlp_hidden == fr.H
            and cfg.featmap_nc == fr.FEAT
            and cfg.num_sample_coarse == fr.NS
            and cfg.vp_n_freqs * 6 + 3 == 63
        )

    def setup(self):
        cfg = self.cfg
        self.mlp = NeRFMLP(
            vp_channels=cfg.vp_channels,
            vd_channels=cfg.vd_channels,
            audio_channels=cfg.audio_style_dims,
            hidden=cfg.mlp_hidden,
            out_features=cfg.featmap_nc,
            compute_dtype=self.compute_dtype,
            name="fg_CD_predictor",
        )
        if cfg.hier_sampling:
            self.fine_mlp = NeRFMLP(
                vp_channels=cfg.vp_channels,
                vd_channels=cfg.vd_channels,
                audio_channels=cfg.audio_style_dims,
                hidden=cfg.mlp_hidden,
                out_features=cfg.featmap_nc,
                compute_dtype=self.compute_dtype,
                name="fine_fg_CD_predictor",
            )
        self.neural_render = NeuralRenderer(
            feat_nc=cfg.featmap_nc,
            out_dim=3,
            final_actvn=True,
            min_feat=32,
            featmap_size=cfg.featmap_size,
            img_size=cfg.pred_img_size,
            bg_type=cfg.bg_type,
            compute_dtype=self.compute_dtype,
            name="neural_render",
        )

    def _point_features(
        self, mlp, pts, dirs, shape_code, appea_code, audio_style
    ):
        """PE + MLP for a set of sample points ([B, N_r, N_s, 3])."""
        cfg = self.cfg
        pe = positional_encoding(pts, cfg.vp_n_freqs, cfg.vp_include_input)
        vd_pe = None
        if cfg.include_vd:
            # per-point view-direction encoding (HeadNeRFNet.py:141-144);
            # the flagship path runs include_vd=False (talker_trainer.py:693).
            vd_pe = positional_encoding(dirs, cfg.vd_n_freqs, cfg.vd_include_input)
        return mlp(pe, shape_code, appea_code, audio_style, vd_pe=vd_pe)

    def __call__(
        self,
        batch_xy: jnp.ndarray,        # [B, N_r, 2] pixel coords
        shape_code: jnp.ndarray,      # [B, 179] iden|expr (audio-overwritten)
        appea_code: jnp.ndarray,      # [B, 127] text|illu
        audio_style: jnp.ndarray,     # [B, 64]
        Rmat: jnp.ndarray,            # [B, 3, 3]
        Tvec: jnp.ndarray,            # [B, 3] or [B, 3, 1]
        inv_inmat: jnp.ndarray,       # [B, 3, 3]
        rng: Optional[jax.Array] = None,   # stratified jitter when training
        gaze: Optional[jnp.ndarray] = None,   # [B, eye_gaze_dim] when
        # include_gaze (HeadNeRFNet.py:51-52: gaze widens the vp channels —
        # appended to the shape code here)
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = batch_xy.shape[0]
        S = cfg.featmap_size
        if cfg.include_gaze:
            g = gaze if gaze is not None else jnp.zeros((B, cfg.eye_gaze_dim))
            shape_code = jnp.concatenate([shape_code, g], axis=-1)

        rays = gen_rays(batch_xy, Rmat, Tvec, inv_inmat)
        zb = stratified_zvals(
            rays, cfg.num_sample_coarse, cfg.world_z1, cfg.world_z2, rng
        )
        sp = sample_points(rays, zb)

        if self._fused_ok and not self.is_initializing():
            out = self._fused_forward(
                rays, sp, shape_code, appea_code, audio_style, B, S
            )
        else:
            feat, density = self._point_features(
                self.mlp, sp.pts, sp.dirs, shape_code, appea_code, audio_style
            )
            comp = alpha_composite(feat, density[..., 0], sp.z_dists, sp.zvals)
            out = self._render_maps(comp, B, S)

        if cfg.hier_sampling:
            fz = fine_zvals(
                comp.weights, sp.zvals, cfg.num_sample_fine + 1,
                rng if rng is not None else None,
            )
            fsp = sample_points(rays, fz)
            ffeat, fdensity = self._point_features(
                self.fine_mlp, fsp.pts, fsp.dirs, shape_code, appea_code, audio_style
            )
            fcomp = alpha_composite(ffeat, fdensity[..., 0], fsp.z_dists, fsp.zvals)
            fine_out = self._render_maps(fcomp, B, S)
            out["fine_merge_img"] = fine_out["merge_img"]

        return out

    def _fused_forward(self, rays, sp, shape_code, appea_code, audio_style, B, S):
        """PE + MLP + compositing via the fused Pallas kernel."""
        from nerf3dtalker_tpu.ops.compositing import CompositeResult
        from nerf3dtalker_tpu.ops.pallas import fused_render as fr

        cfg = self.cfg
        # matmul-form PE writes straight into the kernel's [N, PE_PAD]
        # layout; sp.pts (lane-hostile [..., 3]) is never materialized —
        # XLA dead-code-eliminates it
        pe_pad = fr.pe_pad_for(cfg.vp_pe_dims)
        pe = positional_encoding_rays(
            rays.origins, rays.directions, rays.lengths, sp.zvals,
            cfg.vp_n_freqs, cfg.vp_include_input, pad_to=pe_pad,
        )
        packed = fr.pack_weights(
            self.mlp.variables["params"], shape_code, appea_code, audio_style
        )
        cdt = (jnp.bfloat16 if self.compute_dtype == jnp.bfloat16
               else jnp.float32)
        # fwd ray-tile 256 (16k points) measured fastest on v5e (17.97 ms
        # fwd+bwd vs 18.47 at tile 64; tile 512 exceeds VMEM) — fall back to
        # the largest power-of-two divisor for small ray counts
        if self.fused_mesh is not None:
            # multi-chip: shard_map over (data, rays); local tiles are
            # derived inside from the per-shard ray count
            feat, bg_alpha, depth = fr.fused_render_spmd(
                pe, sp.z_dists, sp.zvals, packed, self.fused_mesh,
                ("data", "rays"), 256, cdt,
                self.fused_interpret, self.fused_input_grads,
            )
        else:
            tile = 256
            while pe.shape[1] % tile:
                tile //= 2
            feat, bg_alpha, depth = fr.fused_render(
                pe, sp.z_dists, sp.zvals, packed,
                tile, cdt, self.fused_interpret, self.fused_input_grads,
            )
        comp = CompositeResult(
            features=feat, bg_alpha=bg_alpha, depth=depth, weights=None
        )
        return self._render_maps(comp, B, S)

    @property
    def _fusedup_ok(self) -> bool:
        cfg = self.cfg
        ratio = cfg.pred_img_size // cfg.featmap_size
        return (
            self.use_fused_upsampler
            and cfg.pred_img_size == ratio * cfg.featmap_size
            and ratio in (2, 4, 8)
        )

    def _render_maps(self, comp, B, S):
        cfg = self.cfg
        fg = comp.features.reshape(B, S, S, cfg.featmap_nc)
        bg_alpha = comp.bg_alpha.reshape(B, S, S, 1)
        bg_featmap = self.neural_render.bg_featmap()
        merge = fg + bg_alpha * bg_featmap          # HeadNeRFNet.py:112
        # two separate upsampler passes (merge, bg) measure faster on v5e
        # than one batch-2 pass (28.1 vs 25.8 ms/step — the concat blocks
        # XLA from overlapping the bg render with the ray kernel)
        if self._fusedup_ok and not self.is_initializing():
            from nerf3dtalker_tpu.models.phase_renderer import (
                extract_phase_params,
            )
            from nerf3dtalker_tpu.ops.pallas.fused_upsampler import (
                fused_upsampler,
            )

            n_blocks = cfg.n_upsample_blocks
            pp = extract_phase_params(
                self.neural_render.variables["params"], n_blocks
            )
            cdt = self.compute_dtype

            def dec(x):
                return fused_upsampler(
                    x, pp, n_blocks, compute_dtype=cdt,
                    interpret=self.fused_interpret,
                )

            merge_img = dec(merge)
            bg_img = dec(bg_featmap)
            return {
                "merge_img": merge_img,
                "bg_img": bg_img,
                "bg_alpha": bg_alpha,
                "depth": comp.depth.reshape(B, S, S),
            }
        merge_img = self.neural_render(merge)
        bg_img = self.neural_render(bg_featmap)
        return {
            "merge_img": merge_img,                  # [B, img, img, 3]
            "bg_img": bg_img,                        # [1, img, img, 3]
            "bg_alpha": bg_alpha,
            "depth": comp.depth.reshape(B, S, S),
        }


def build_code_and_cam(
    base_iden: jnp.ndarray,      # [B, 100]
    base_expr: jnp.ndarray,      # [B, 79]
    base_text: jnp.ndarray,      # [B, 100]
    base_illu: jnp.ndarray,      # [B, 27]
    audio_exp: Optional[jnp.ndarray] = None,  # [B, 64] SadTalker exp
):
    """Assemble shape/appearance codes; audio expression overwrites the first
    64 expr dims (reference talker_trainer.py:835-897, overwrite at :853)."""
    if audio_exp is not None:
        base_expr = base_expr.at[:, :64].set(audio_exp)
    shape_code = jnp.concatenate([base_iden, base_expr], axis=-1)
    appea_code = jnp.concatenate([base_text, base_illu], axis=-1)
    return shape_code, appea_code
