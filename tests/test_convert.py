"""Golden-value checkpoint-conversion tests: torch oracles built from the
documented reference layer spec, converted via utils/convert, must produce
identical outputs through the flax modules.

(The published model_Reso32/64.pth checkpoints are not in this image; these
tests prove the conversion mechanism on synthetic torch modules with the
exact reference key schema — NetWorks/models.py:32-59,
talker_trainer.py:408-473.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models.audio import Audio2Style
from nerf3dtalker_tpu.models.nerf_mlp import NeRFMLP
from nerf3dtalker_tpu.utils.convert import (
    convert_audio2style,
    convert_nerf_mlp,
)


def _torch_mlp(vp=242, vd=127, h=384, out=256):
    """Torch twin of the reference MLP spec (models.py:29-59)."""
    m = nn.Module()
    m.add_module("FeaExt_module_0", nn.Conv2d(vp + 64, h, 1))
    for i in range(1, 8):
        cin = h + vp if i == 5 else h
        m.add_module(f"FeaExt_module_{i}", nn.Conv2d(cin, h, 1))
    m.add_module("density_module", nn.Conv2d(h, 1, 1))
    m.add_module("RGB_layer_0", nn.Conv2d(h, h, 1))
    m.add_module("RGB_layer_1", nn.Conv2d(h + vd, h // 2, 1))
    m.add_module("RGB_layer_2", nn.Conv2d(h // 2, out, 1))
    return m


def _torch_mlp_forward(m, vps, vds, audio):
    """Reference forward semantics (models.py:62-87)."""
    import torch.nn.functional as F

    x = torch.cat([vps, audio], dim=1)
    for i in range(8):
        x = F.relu(m.get_submodule(f"FeaExt_module_{i}")(x))
        if i == 4:   # skips = [n_layers//2] applied post-relu
            x = torch.cat([vps, x], dim=1)
    density = m.get_submodule("density_module")(x)
    x = m.get_submodule("RGB_layer_0")(x)
    x = m.get_submodule("RGB_layer_1")(torch.cat([x, vds], dim=1))
    x = F.relu(x)
    rgb = m.get_submodule("RGB_layer_2")(x)
    return rgb, F.relu(density)


def test_nerf_mlp_matches_torch_reference_spec():
    torch.manual_seed(0)
    cfg = reso64()
    m = _torch_mlp()
    sd = {f"fg_CD_predictor.{k}": v for k, v in m.state_dict().items()}
    params = {"params": jax.tree.map(jnp.asarray, convert_nerf_mlp(sd))}

    rng = np.random.default_rng(0)
    B, Nr, Ns = 1, 8, 4
    pe = rng.standard_normal((B, Nr, Ns, 63)).astype(np.float32)
    shape = rng.standard_normal((B, 179)).astype(np.float32) * 0.1
    appea = rng.standard_normal((B, 127)).astype(np.float32) * 0.1
    aud = rng.standard_normal((B, 64)).astype(np.float32) * 0.1

    mlp = NeRFMLP(vp_channels=cfg.vp_channels, vd_channels=cfg.vd_channels,
                  hidden=384, out_features=256)
    feat, dens = mlp.apply(
        params, jnp.asarray(pe), jnp.asarray(shape), jnp.asarray(appea),
        jnp.asarray(aud),
    )

    # torch oracle: broadcast codes over [N_r, N_s] like the reference
    def bc(code, C):
        t = torch.from_numpy(code).view(B, C, 1, 1)
        return t.expand(B, C, Nr, Ns)

    vps = torch.cat(
        [torch.from_numpy(pe).permute(0, 3, 1, 2), bc(shape, 179)], dim=1
    )
    vds = bc(appea, 127)
    audio = bc(aud, 64)
    with torch.no_grad():
        rgb_t, dens_t = _torch_mlp_forward(m, vps, vds, audio)
    np.testing.assert_allclose(
        np.asarray(feat), rgb_t.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dens), dens_t.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )


class _TorchAudio2Style(nn.Module):
    """Torch twin of Audio2style (talker_trainer.py:408-473)."""

    def __init__(self):
        super().__init__()
        self.rnn = nn.Module()
        self.rnn.rnn = nn.LSTM(1280, 640, 2, batch_first=True, bidirectional=True)
        for i, (cin, cout) in enumerate(((1280, 640), (640, 320), (320, 64))):
            self.add_module(
                f"linear{i+1}",
                nn.Sequential(nn.Linear(cin, cout), nn.LeakyReLU(0.2, True),
                              nn.Dropout(0.5)),
            )

    def forward(self, mels):
        x = mels.reshape(mels.shape[0], -1).unsqueeze(0)
        x, _ = self.rnn.rnn(x)
        x = x[0]
        x = self.linear1(x)
        x = self.linear2(x)
        return self.linear3(x)


def test_audio2style_matches_torch_lstm():
    torch.manual_seed(1)
    tm = _TorchAudio2Style().eval()
    params = {"params": jax.tree.map(jnp.asarray, convert_audio2style(tm.state_dict()))}

    rng = np.random.default_rng(1)
    mels = rng.standard_normal((5, 80, 16)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm(torch.from_numpy(mels)).numpy()

    got = np.asarray(Audio2Style().apply(params, jnp.asarray(mels)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def _torch_netg():
    """Torch twin of the SadTalker netG spec (s_audio2exp_models/
    networks.py:26-74): 13 Conv2d+BN blocks + mapping1 Linear."""
    spec = [
        (1, 32, 3, (1, 1), 1, False), (32, 32, 3, (1, 1), 1, True),
        (32, 32, 3, (1, 1), 1, True),
        (32, 64, 3, (3, 1), 1, False), (64, 64, 3, (1, 1), 1, True),
        (64, 64, 3, (1, 1), 1, True),
        (64, 128, 3, (3, 3), 1, False), (128, 128, 3, (1, 1), 1, True),
        (128, 128, 3, (1, 1), 1, True),
        (128, 256, 3, (3, 2), 1, False), (256, 256, 3, (1, 1), 1, True),
        (256, 512, 3, (1, 1), 0, False), (512, 512, 1, (1, 1), 0, False),
    ]
    enc = nn.Module()
    blocks = []
    for i, (cin, cout, k, s, p, res) in enumerate(spec):
        blk = nn.Module()
        blk.add_module("conv_block", nn.Sequential(
            nn.Conv2d(cin, cout, k, s, p), nn.BatchNorm2d(cout)))
        blk.residual = res
        enc.add_module(str(i), blk)
        blocks.append(blk)
    m = nn.Module()
    m.add_module("audio_encoder", enc)
    m.add_module("mapping1", nn.Linear(512 + 64 + 1, 64))
    return m, blocks


def _torch_netg_forward(m, blocks, mel, ref, ratio):
    import torch.nn.functional as F

    x = mel
    for blk in blocks:
        y = blk.get_submodule("conv_block")(x)
        if blk.residual:
            y = y + x
        x = F.relu(y)
    x = x.reshape(x.size(0), -1)
    return m.get_submodule("mapping1")(
        torch.cat([x, ref.reshape(x.size(0), -1), ratio.reshape(x.size(0), -1)], 1)
    )


def test_simple_wrapper_v2_matches_torch_reference_spec():
    from nerf3dtalker_tpu.models.audio import SimpleWrapperV2
    from nerf3dtalker_tpu.utils.convert import convert_simple_wrapper_v2

    torch.manual_seed(1)
    m, blocks = _torch_netg()
    # randomize BN running stats so the converted batch_stats actually matter
    for blk in blocks:
        bn = blk.get_submodule("conv_block")[1]
        bn.running_mean.normal_(0.0, 0.1)
        bn.running_var.uniform_(0.5, 1.5)
    m.eval()

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 1, 80, 16)).astype(np.float32)
    ref = rng.standard_normal((2, 64)).astype(np.float32)
    ratio = rng.uniform(0, 1, (2, 1)).astype(np.float32)
    with torch.no_grad():
        want = _torch_netg_forward(
            m, blocks, torch.from_numpy(mel), torch.from_numpy(ref),
            torch.from_numpy(ratio),
        ).numpy()

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    variables = convert_simple_wrapper_v2(sd)
    got = SimpleWrapperV2().apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(mel.transpose(0, 2, 3, 1)),   # NCHW -> NHWC
        jnp.asarray(ref), jnp.asarray(ratio),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
