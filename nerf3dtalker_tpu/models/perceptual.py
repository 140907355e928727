"""VGG16 perceptual feature extractor (flax) + LPIPS-style metric nets.

Re-implements the loss topology of reference `VGGPerceptualLoss`
(Utils/HeadNeRFLossUtils.py:23-64): torchvision VGG16 `.features[:23]`
split into four blocks (conv1_x, conv2_x, conv3_x, conv4_x), inputs
ImageNet-normalized and bilinearly resized to 224, L1 distance between
block activations summed over blocks.

Weights convert 1:1 from a torchvision `vgg16().features` state_dict via
:func:`convert_torchvision_vgg16` (torch [O,I,kh,kw] -> flax HWIO).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision vgg16.features conv layer indices and channels, through
# block 4 (index < 23): (torch_layer_idx, out_channels)
_VGG16_CONVS = [
    (0, 64), (2, 64),            # block 1  (features[:4] ends after relu(2))
    (5, 128), (7, 128),          # block 2  (features[4:9])
    (10, 256), (12, 256), (14, 256),   # block 3 (features[9:16])
    (17, 512), (19, 512), (21, 512),   # block 4 (features[16:23])
]
# maxpool positions precede torch indices 5, 10, 17
_POOL_BEFORE = {5, 10, 17}
# block boundaries: features after relu of torch idx 2, 7, 14, 21
_BLOCK_ENDS = {2: 0, 7: 1, 14: 2, 21: 3}

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


class VGG16Features(nn.Module):
    """Returns the four block activations used by the perceptual loss."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        for idx, ch in _VGG16_CONVS:
            if idx in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{idx}")(x)
            x = nn.relu(x)
            if idx in _BLOCK_ENDS:
                feats.append(x)
        return feats


def preprocess(img: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """[B,H,W,3] in [0,1] -> normalized 224x224 (HeadNeRFLossUtils.py:45-49)."""
    x = (img - IMAGENET_MEAN) / IMAGENET_STD
    if resize:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 224, 224, C), method="linear")
    return x


def vgg_features(
    vgg_params, img: jnp.ndarray, resize: bool = True, compute_dtype=None
) -> List[jnp.ndarray]:
    """The four perceptual block activations for [B,H,W,3] in [0,1].

    With `compute_dtype=jnp.bfloat16` the convs run on the MXU at bf16
    (the framework's AMP policy, SURVEY §2.9 P5); activations return f32.
    """
    x = preprocess(img, resize)
    params = vgg_params
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        params = jax.tree.map(lambda a: a.astype(compute_dtype), vgg_params)
    feats = VGG16Features().apply(params, x)
    return [f.astype(jnp.float32) for f in feats]


def vgg_perceptual_loss(
    vgg_params,
    pred: jnp.ndarray,
    target: jnp.ndarray = None,
    feature_layers: Sequence[int] = (0, 1, 2, 3),
    resize: bool = True,
    compute_dtype=None,
    target_feats: Sequence[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum of per-block L1 distances (HeadNeRFLossUtils.py:50-64).

    Pass `target_feats` (from :func:`vgg_features`, precomputed offline
    per frame — they don't depend on parameters) to skip the target
    branch's forward in the training step.
    """
    fx = vgg_features(vgg_params, pred, resize, compute_dtype)
    fy = (
        list(target_feats) if target_feats is not None
        else vgg_features(vgg_params, target, resize, compute_dtype)
    )
    loss = 0.0
    for i in feature_layers:
        loss = loss + jnp.mean(jnp.abs(fx[i] - fy[i]))
    return loss


def init_vgg16(rng: jax.Array) -> Dict:
    """Random-init VGG16 params (use convert_torchvision_vgg16 for the
    pretrained weights when a torchvision checkpoint is available)."""
    return VGG16Features().init(rng, jnp.zeros((1, 224, 224, 3)))


def load_vgg16(path: str = "", seed: int = 0) -> Dict:
    """VGG16 feature params for the perceptual loss, from the best
    available source:

      * `path` to a torch `vgg16().features.state_dict()` checkpoint or an
        .npz with the same keys -> exact reference weights
        (HeadNeRFLossUtils.py:27-30 uses torchvision's pretrained VGG16);
      * otherwise a deterministic random init — random-conv perceptual
        features are a documented stand-in (the loss structure, weights,
        and gradients flow identically; swap in converted weights for
        value parity with the reference objective).
    """
    if path:
        if path.endswith(".npz"):
            import numpy as np

            sd = dict(np.load(path))
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            # accept either a bare features state_dict or a full vgg16 one
            if any(k.startswith("features.") for k in sd):
                sd = {
                    k[len("features."):]: v
                    for k, v in sd.items()
                    if k.startswith("features.")
                }
        return convert_torchvision_vgg16(sd)
    return init_vgg16(jax.random.key(seed))


def convert_torchvision_vgg16(state_dict) -> Dict:
    """torchvision `vgg16().features.state_dict()` -> flax params pytree.

    Accepts either tensors or numpy arrays; keys look like '0.weight'.
    """
    import numpy as np

    params = {}
    for idx, _ in _VGG16_CONVS:
        w = state_dict[f"{idx}.weight"]
        b = state_dict[f"{idx}.bias"]
        w = np.asarray(w)
        b = np.asarray(b)
        # torch OIHW -> flax HWIO
        params[f"conv{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return {"params": params}
