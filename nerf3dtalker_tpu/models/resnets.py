"""ResNet backbones: torchvision-style ResNet50 (Deep3DFaceRecon trunk),
ArcFace IResNet, and the MobileFaceNet mobile backbone.

Equivalents of reference `s_face3d/models/networks.py` (define_net_recon:
ResNet50 -> fc 257 coeff regressor, the SadTalker `net_recon` used by
CropAndExtract at talker_trainer.py:215-316) and
`s_face3d/models/arcface_torch/backbones/iresnet.py:1-187` (iresnet18..200:
BN-Conv-BN-PReLU-Conv-BN blocks, stride-first layout, BN-FC-BN feature
head).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    feats: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, name=name)
        y = nn.Conv(self.feats, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.feats, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.feats * self.expansion, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3")(y)
        if self.stride != 1 or x.shape[-1] != self.feats * self.expansion:
            x = nn.Conv(self.feats * self.expansion, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + y)


class ResNet50(nn.Module):
    """torchvision resnet50 trunk -> pooled 2048-d feature."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for li, (c, n, s) in enumerate([(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for b in range(n):
                x = Bottleneck(c, s if b == 0 else 1, name=f"layer{li+1}_{b}")(x, train)
        return jnp.mean(x, axis=(1, 2))


class ReconNet(nn.Module):
    """define_net_recon('resnet50', use_last_fc=False): trunk + fc -> 257
    BFM coefficients (networks.py define_net_recon / ReconNetWrapper)."""

    coeff_dim: int = 257

    @nn.compact
    def __call__(self, x, train=False):
        feat = ResNet50(name="backbone")(x, train)
        return nn.Dense(self.coeff_dim, kernel_init=nn.initializers.zeros,
                        name="final")(feat)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class IBasicBlock(nn.Module):
    """iresnet block (iresnet.py:33-64): BN -> conv -> BN -> PReLU -> conv
    (stride) -> BN, identity/projection skip."""

    feats: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, epsilon=1e-5, name=name
        )
        y = bn("bn1")(x)
        y = nn.Conv(self.feats, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv1")(y)
        y = bn("bn2")(y)
        y = PReLU(name="prelu")(y)
        y = nn.Conv(self.feats, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(y)
        y = bn("bn3")(y)
        if self.stride != 1 or x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down_conv")(x)
            x = bn("down_bn")(x)
        return x + y


class IResNet(nn.Module):
    """ArcFace backbone (iresnet.py:67-140). layers=(2,2,2,2) is iresnet18,
    (3,4,14,3) iresnet50, (3,13,30,3) iresnet100."""

    layers: Sequence[int] = (2, 2, 2, 2)
    embed_dim: int = 512
    fp16: bool = False
    input_size: int = 112

    @nn.compact
    def __call__(self, x, train=False):
        cdt = jnp.bfloat16 if self.fp16 else jnp.float32
        x = x.astype(cdt)
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="bn1")(x)
        x = PReLU(name="prelu")(x)
        for li, (c, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for b in range(n):
                x = IBasicBlock(c, 2 if b == 0 else 1, name=f"layer{li+1}_{b}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, name="bn2")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dropout(0.0, deterministic=True)(x)
        x = nn.Dense(self.embed_dim, name="fc")(x)
        # "features" BN1d (iresnet.py:126): affine-normalized embedding
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         use_scale=True, use_bias=True, name="features")(x)
        return x


class _ConvBNPReLU(nn.Module):
    """mobilefacenet.py ConvBlock: conv (no bias) -> BN -> per-channel PReLU."""

    feats: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.feats, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return PReLU(name="prelu")(x)


class _ConvBN(nn.Module):
    """mobilefacenet.py LinearBlock: conv (no bias) -> BN, no activation."""

    feats: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    groups: int = 1
    pad: str = "half"

    @nn.compact
    def __call__(self, x, train=False):
        pad = ("VALID" if self.pad == "valid"
               else tuple((k // 2, k // 2) for k in self.kernel))
        x = nn.Conv(self.feats, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, feature_group_count=self.groups,
                    use_bias=False, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, name="bn")(x)


class DepthWiseBlock(nn.Module):
    """mobilefacenet.py DepthWise: 1x1 expand -> 3x3 depthwise (stride)
    -> 1x1 linear project, optional identity residual."""

    feats: int
    expand: int
    stride: int = 2
    residual: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        y = _ConvBNPReLU(self.expand, name="expand")(x, train)
        y = _ConvBNPReLU(self.expand, kernel=(3, 3), stride=self.stride,
                         groups=self.expand, name="dw")(y, train)
        y = _ConvBN(self.feats, name="project")(y, train)
        return x + y if self.residual else y


class MobileFaceNet(nn.Module):
    """ArcFace mobile backbone, NHWC flax re-expression of
    `s_face3d/models/arcface_torch/backbones/mobilefacenet.py:89-127`
    (scale=2 cavaface variant): stem convs, 4 depthwise-downsample stages
    with residual stacks, 1x1 sep conv to 512, GDC head (7x7 depthwise
    linear -> dense -> BN) -> `embed_dim` face embedding. 112x112 input.
    """

    embed_dim: int = 512
    fp16: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        # scale=2 cavaface variant only — the expansion widths and the
        # stem_dw grouping below are specific to it (mobilefacenet.py:92)
        c1, c2 = 128, 256
        if self.fp16:
            x = x.astype(jnp.bfloat16)
        x = _ConvBNPReLU(c1, kernel=(3, 3), stride=2, name="stem")(x, train)
        x = _ConvBNPReLU(c1, kernel=(3, 3), groups=64, name="stem_dw")(x, train)
        # (stage channels, residual blocks, expansion width) per
        # mobilefacenet.py:96-103
        x = DepthWiseBlock(c1, expand=128, name="down1")(x, train)
        for b in range(4):
            x = DepthWiseBlock(c1, expand=128, stride=1, residual=True,
                               name=f"res1_{b}")(x, train)
        x = DepthWiseBlock(c2, expand=256, name="down2")(x, train)
        for b in range(6):
            x = DepthWiseBlock(c2, expand=256, stride=1, residual=True,
                               name=f"res2_{b}")(x, train)
        x = DepthWiseBlock(c2, expand=512, name="down3")(x, train)
        for b in range(2):
            x = DepthWiseBlock(c2, expand=256, stride=1, residual=True,
                               name=f"res3_{b}")(x, train)
        # reference runs conv_sep + GDC in fp32 even under autocast
        # (mobilefacenet.py:122-125: `x.float() if self.fp16`)
        x = x.astype(jnp.float32)
        x = _ConvBNPReLU(512, name="sep")(x, train)
        # GDC (mobilefacenet.py:76-86): global 7x7 depthwise linear conv
        x = _ConvBN(512, kernel=(x.shape[1], x.shape[2]), groups=512,
                    pad="valid", name="gdc")(x, train)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dense(self.embed_dim, use_bias=False, name="fc")(x)
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                            name="features")(x)
