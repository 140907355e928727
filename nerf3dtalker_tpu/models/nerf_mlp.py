"""The NeRF point MLP.

Functional equivalent of reference `MLPforNeRF` (NetWorks/models.py:13-87),
which is 8 Conv2d-1x1 layers over `[B, C, N_r, N_s]` — i.e. a pointwise MLP
in disguise. Here it is a real MLP over channels-last points so every layer
is a single large `[N, C_in] @ [C_in, C_out]` matmul on the MXU.

TPU-first differences from the reference:

  * The per-batch conditioning codes (shape 179-d, audio-style 64-d,
    appearance 127-d) are constant over the N_r x N_s point grid. The
    reference broadcasts them to `[B, C, N_r, 64]` and concatenates
    (HeadNeRFNet.py:149-152); we instead split the first-layer / skip-layer /
    rgb-layer kernels and fold the code contribution into a per-batch bias:
        cat([pe, code]) @ W == pe @ W_pe + code @ W_code
    saving the HBM materialization of the broadcast inputs entirely.
  * Parameters are stored in the reference's full-kernel layout so that
    converted checkpoints (`FeaExt_module_*`, `density_module`,
    `RGB_layer_*`) map 1:1; the split happens at apply time (a free slice).

Layer topology (models.py:29-59, with h=384 per HeadNeRFOptions.py:25):
  fea_0: [vp+64 -> h]; fea_1..7: [h -> h] except fea_5: [h+vp -> h]
  (skip concat of the vp features after layer 4, models.py:74-75);
  density: [h -> 1]; rgb_0: [h -> h] (no activation, models.py:78);
  rgb_1: [h+vd -> h//2]; rgb_2: [h//2 -> featmap_nc].
ReLU after every fea layer and after rgb_1; density ReLU; sigmoid on rgb
only when res_nfeat == 3 (models.py:83-86).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


class NeRFMLP(nn.Module):
    vp_channels: int          # PE + shape-code channels (242 for the flagship)
    vd_channels: int          # appearance channels (127)
    audio_channels: int = 64
    n_layers: int = 8
    hidden: int = 384
    out_features: int = 256   # res_nfeat: 256 feature / 3 rgb
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pe: jnp.ndarray,          # [..., P] positional encoding of points
        shape_code: jnp.ndarray,  # [B, S] (S + P == vp_channels)
        vd_code: jnp.ndarray,     # [B, A_c] appearance code (per batch)
        audio_style: jnp.ndarray, # [B, audio_channels]
        vd_pe: jnp.ndarray | None = None,  # [..., Dv] per-point view-dir PE
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (features [..., out_features], density [..., 1]).

        `pe` has leading dims [B, N_r, N_s]; codes broadcast over N_r, N_s.
        When view-direction conditioning is on (HeadNeRFNet.py:56-60 with
        include_vd=True), `vd_pe` carries the per-point direction encoding and
        the rgb_1 kernel rows are laid out [hidden | vd_pe | appea], matching
        the reference concat order cat([x, cat([vd_embed, appea])]).
        """
        P = pe.shape[-1]
        S = shape_code.shape[-1]
        assert P + S == self.vp_channels, (P, S, self.vp_channels)
        h, A = self.hidden, self.audio_channels
        cdt = self.compute_dtype

        def dense(name, cin, cout):
            k = self.param(name + "_kernel", nn.initializers.xavier_uniform(), (cin, cout))
            b = self.param(name + "_bias", nn.initializers.zeros, (cout,))
            return k, b

        pe = pe.astype(cdt)
        bc = (slice(None),) + (None,) * (pe.ndim - 2)  # broadcast codes over point dims

        # ---- fea_0 over [pe | shape | audio] via kernel split ----
        k0, b0 = dense("fea_0", self.vp_channels + A, h)
        k0 = k0.astype(cdt)
        code_bias0 = (
            shape_code.astype(cdt) @ k0[P : P + S]
            + audio_style.astype(cdt) @ k0[P + S :]
            + b0.astype(cdt)
        )  # [B, h]
        x = pe @ k0[:P] + code_bias0[bc]
        x = nn.relu(x)

        skip = self.n_layers // 2  # == 4 (models.py:23)
        for i in range(1, self.n_layers):
            if i == skip + 1:
                # input is cat([vp_feats, x]) (models.py:74-75); vp = [pe|shape]
                ki, bi = dense(f"fea_{i}", self.vp_channels + h, h)
                ki = ki.astype(cdt)
                cb = shape_code.astype(cdt) @ ki[P : P + S] + bi.astype(cdt)
                x = pe @ ki[:P] + x @ ki[P + S :] + cb[bc]
            else:
                ki, bi = dense(f"fea_{i}", h, h)
                x = x @ ki.astype(cdt) + bi.astype(cdt)
            x = nn.relu(x)

        kd, bd = dense("density", h, 1)
        density = x @ kd.astype(cdt) + bd.astype(cdt)

        k_r0, b_r0 = dense("rgb_0", h, h)
        x = x @ k_r0.astype(cdt) + b_r0.astype(cdt)  # NOTE: no activation (models.py:78)

        k_r1, b_r1 = dense("rgb_1", h + self.vd_channels, h // 2)
        k_r1 = k_r1.astype(cdt)
        Dv = 0 if vd_pe is None else vd_pe.shape[-1]
        cb1 = vd_code.astype(cdt) @ k_r1[h + Dv :] + b_r1.astype(cdt)
        x = x @ k_r1[:h] + cb1[bc]
        if vd_pe is not None:
            x = x + vd_pe.astype(cdt) @ k_r1[h : h + Dv]
        x = nn.relu(x)

        k_r2, b_r2 = dense("rgb_2", h // 2, self.out_features)
        rgb = x @ k_r2.astype(cdt) + b_r2.astype(cdt)

        density = nn.relu(density)
        if self.out_features == 3:
            rgb = nn.sigmoid(rgb)
        return rgb.astype(jnp.float32), density.astype(jnp.float32)
