"""Reference (PyTorch) checkpoint converters.

Maps the reference's `torch.save` state_dicts onto this framework's param
pytrees so published checkpoints drop in:

  * HeadNeRF: `net` keys `fg_CD_predictor.FeaExt_module_{i}.{weight,bias}`
    (Conv2d 1x1 [out,in,1,1] -> dense [in,out]), `density_module`,
    `RGB_layer_{0,1,2}` (NetWorks/models.py:32-59), and the neural
    renderer `neural_render.feat_upsample_list.{i}.layer_{1,2}`,
    `feat_2_rgb_list.{i}`, `feat_layers.{i}`, `bg_featmap`
    (neural_renderer.py:49-69; NCHW featmap -> NHWC).
  * Audio2Style: `audio2style` keys `rnn.rnn.{weight,bias}_{ih,hh}_l{k}`
    (torch LSTM gate order i,f,g,o -> flax OptimizedLSTMCell i,f,g,o) and
    `linear{1..3}.0.{weight,bias}` (talker_trainer.py:408-473).

Checkpoints are self-describing via the embedded `para` dict
(talker_trainer.py:915-918) — `convert_headnerf_checkpoint` reads it to
pick the NeRFConfig.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _dense(sd, key):
    """torch Conv2d-1x1/Linear -> flax dense kernel [in, out] + bias."""
    w = np.asarray(sd[f"{key}.weight"])
    if w.ndim == 4:      # conv1x1 [out, in, 1, 1]
        w = w[:, :, 0, 0]
    return {"kernel": w.T.astype(np.float32),
            "bias": np.asarray(sd[f"{key}.bias"]).astype(np.float32)}


def convert_nerf_mlp(sd: Dict, prefix: str = "fg_CD_predictor") -> Dict:
    """state_dict -> NeRFMLP params subtree (models/nerf_mlp.py layout)."""
    out = {}
    for i in range(8):
        d = _dense(sd, f"{prefix}.FeaExt_module_{i}")
        out[f"fea_{i}_kernel"] = d["kernel"]
        out[f"fea_{i}_bias"] = d["bias"]
    d = _dense(sd, f"{prefix}.density_module")
    out["density_kernel"], out["density_bias"] = d["kernel"], d["bias"]
    for i in range(3):
        d = _dense(sd, f"{prefix}.RGB_layer_{i}")
        out[f"rgb_{i}_kernel"], out[f"rgb_{i}_bias"] = d["kernel"], d["bias"]
    return out


def convert_neural_renderer(sd: Dict, n_blocks: int,
                            prefix: str = "neural_render") -> Dict:
    """state_dict -> NeuralRenderer params (models/neural_renderer.py)."""
    out = {}
    for i in range(n_blocks):
        up = {}
        for li in (1, 2):
            d = _dense(sd, f"{prefix}.feat_upsample_list.{i}.layer_{li}")
            up[f"layer_{li}"] = d
        out[f"feat_upsample_{i}"] = up
        out[f"feat_layer_{i}"] = _dense(sd, f"{prefix}.feat_layers.{i}")
    for i in range(n_blocks + 1):
        out[f"feat_2_rgb_{i}"] = _dense(sd, f"{prefix}.feat_2_rgb_list.{i}")
    bg = np.asarray(sd[f"{prefix}.bg_featmap"])            # [1, C, H, W]
    out["bg_featmap"] = bg.transpose(0, 2, 3, 1).astype(np.float32)
    return out


def convert_headnerf(sd: Dict, n_blocks: int = 3) -> Dict:
    """Full `net` state_dict -> HeadNeRF params['params'] tree."""
    return {
        "fg_CD_predictor": convert_nerf_mlp(sd),
        "neural_render": convert_neural_renderer(sd, n_blocks),
    }


def _lstm_cell(sd, prefix: str, layer: int, reverse: bool) -> Dict:
    """torch LSTM layer weights -> flax OptimizedLSTMCell params.

    torch packs gates [i, f, g, o] x hidden rows in weight_ih_l{k} /
    weight_hh_l{k} ([4H, in]); flax OptimizedLSTMCell uses dense kernels
    per gate {i,f,g,o} for input (ii,if,ig,io) and hidden (hi,hf,hg,ho).
    """
    suf = f"_l{layer}" + ("_reverse" if reverse else "")
    w_ih = np.asarray(sd[f"{prefix}.weight_ih{suf}"])
    w_hh = np.asarray(sd[f"{prefix}.weight_hh{suf}"])
    b_ih = np.asarray(sd[f"{prefix}.bias_ih{suf}"])
    b_hh = np.asarray(sd[f"{prefix}.bias_hh{suf}"])
    Hh = w_hh.shape[1]
    gates = {}
    order = ("i", "f", "g", "o")
    for gi, gname in enumerate(order):
        sl = slice(gi * Hh, (gi + 1) * Hh)
        # flax OptimizedLSTMCell: input denses bias-free, hidden denses
        # carry the (combined) bias
        gates[f"i{gname}"] = {"kernel": w_ih[sl].T.astype(np.float32)}
        gates[f"h{gname}"] = {
            "kernel": w_hh[sl].T.astype(np.float32),
            "bias": (b_ih[sl] + b_hh[sl]).astype(np.float32),
        }
    return gates


def convert_audio2style(sd: Dict, prefix: str = "") -> Dict:
    """`audio2style` state_dict -> Audio2Style params (models/audio.py)."""
    p = (prefix + ".") if prefix else ""
    out = {"rnn": {}}
    for layer in range(2):
        for rev, name in ((False, "fwd"), (True, "bwd")):
            out["rnn"][f"l{layer}_{name}"] = _lstm_cell(
                sd, f"{p}rnn.rnn", layer, rev
            )
    for i in (1, 2, 3):
        out[f"linear{i}"] = _dense(sd, f"{p}linear{i}.0")
    return out


def convert_simple_wrapper_v2(sd: Dict) -> Dict:
    """SadTalker netG state_dict -> SimpleWrapperV2 variables.

    Torch layout (s_audio2exp_models/networks.py:26-74, safetensors keys
    with the `audio2exp` prefix stripped): 13 `audio_encoder.{i}` Conv2d+BN
    blocks plus `mapping1`. Returns {"params", "batch_stats"} for the NHWC
    flax module (models/audio.py SimpleWrapperV2)."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(13):
        base = f"audio_encoder.{i}.conv_block"
        w = np.asarray(sd[f"{base}.0.weight"])      # [out, in, kh, kw]
        params[f"enc_{i}"] = {
            "conv": {
                "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                "bias": np.asarray(sd[f"{base}.0.bias"]).astype(np.float32),
            },
            "bn": {
                "scale": np.asarray(sd[f"{base}.1.weight"]).astype(np.float32),
                "bias": np.asarray(sd[f"{base}.1.bias"]).astype(np.float32),
            },
        }
        stats[f"enc_{i}"] = {
            "bn": {
                "mean": np.asarray(sd[f"{base}.1.running_mean"]).astype(np.float32),
                "var": np.asarray(sd[f"{base}.1.running_var"]).astype(np.float32),
            }
        }
    params["mapping1"] = _dense(sd, "mapping1")
    return {"params": params, "batch_stats": stats}


def convert_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a reference `*_ckpt.pth.tar` -> (headnerf_params, meta).

    The checkpoint layout is `{epoch, net, audio2style, ..., para}`
    (talker_trainer.py:913-937); `para` holds featmap/img sizes.
    """
    from nerf3dtalker_tpu.data.ingest import torch_state_dict_to_numpy
    import torch

    ck = torch.load(path, map_location="cpu")
    para = ck.get("para", {})
    import math

    n_blocks = int(
        math.log2(para.get("pred_img_size", 256))
        - math.log2(para.get("featmap_size", 32))
    )
    net_sd = {k: np.asarray(v) for k, v in ck["net"].items()}
    params = {"params": convert_headnerf(net_sd, n_blocks)}
    audio = None
    if "audio2style" in ck:
        a_sd = {k: np.asarray(v) for k, v in ck["audio2style"].items()}
        audio = {"params": convert_audio2style(a_sd)}
    return params, {"para": para, "audio2style": audio, "epoch": ck.get("epoch")}


def _conv_bn_prelu(sd, base, has_prelu=True):
    """Reference mobilefacenet ConvBlock/LinearBlock (`.layers.0` Conv2d,
    `.1` BN2d, `.2` PReLU) -> {params, stats} for _ConvBNPReLU/_ConvBN."""
    w = np.asarray(sd[f"{base}.layers.0.weight"])       # [out, in/g, kh, kw]
    params = {
        "conv": {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)},
        "bn": {
            "scale": np.asarray(sd[f"{base}.layers.1.weight"]).astype(np.float32),
            "bias": np.asarray(sd[f"{base}.layers.1.bias"]).astype(np.float32),
        },
    }
    if has_prelu:
        params["prelu"] = {
            "alpha": np.asarray(sd[f"{base}.layers.2.weight"]).astype(np.float32)
        }
    stats = {
        "bn": {
            "mean": np.asarray(sd[f"{base}.layers.1.running_mean"]).astype(np.float32),
            "var": np.asarray(sd[f"{base}.layers.1.running_var"]).astype(np.float32),
        }
    }
    return params, stats


def convert_mobilefacenet(sd: Dict) -> Dict:
    """MobileFaceNet state_dict (arcface_torch backbones/mobilefacenet.py)
    -> flax MobileFaceNet variables.

    Layer map: layers.0/1 stem ConvBlocks; layers.{2,4,6} DepthWise
    downsamples; layers.{3,5,7} Residual stacks (4/6/2 blocks);
    conv_sep; features = GDC (global depthwise LinearBlock + Linear +
    BN1d)."""
    params: Dict = {}
    stats: Dict = {}

    def put(name, base, has_prelu=True):
        params[name], stats[name] = _conv_bn_prelu(sd, base, has_prelu)

    def put_dw(name, base):
        p, s = {}, {}
        p["expand"], s["expand"] = _conv_bn_prelu(sd, f"{base}.layers.0")
        p["dw"], s["dw"] = _conv_bn_prelu(sd, f"{base}.layers.1")
        p["project"], s["project"] = _conv_bn_prelu(
            sd, f"{base}.layers.2", has_prelu=False
        )
        params[name], stats[name] = p, s

    put("stem", "layers.0")
    put("stem_dw", "layers.1")
    put_dw("down1", "layers.2")
    for b in range(4):
        put_dw(f"res1_{b}", f"layers.3.layers.{b}")
    put_dw("down2", "layers.4")
    for b in range(6):
        put_dw(f"res2_{b}", f"layers.5.layers.{b}")
    put_dw("down3", "layers.6")
    for b in range(2):
        put_dw(f"res3_{b}", f"layers.7.layers.{b}")
    put("sep", "conv_sep")
    put("gdc", "features.layers.0", has_prelu=False)
    params["fc"] = {
        "kernel": np.asarray(sd["features.layers.2.weight"]).T.astype(np.float32)
    }
    params["features"] = {
        "scale": np.asarray(sd["features.layers.3.weight"]).astype(np.float32),
        "bias": np.asarray(sd["features.layers.3.bias"]).astype(np.float32),
    }
    stats["features"] = {
        "mean": np.asarray(sd["features.layers.3.running_mean"]).astype(np.float32),
        "var": np.asarray(sd["features.layers.3.running_var"]).astype(np.float32),
    }
    return {"params": params, "batch_stats": stats}


def _conv_bn(sd, base):
    """wav_models/conv.py Conv2d block (`.conv_block.0` Conv2d w/ bias,
    `.1` BN2d) -> ConvBN {params, stats}."""
    w = np.asarray(sd[f"{base}.conv_block.0.weight"])
    params = {
        "conv": {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": np.asarray(sd[f"{base}.conv_block.0.bias"]).astype(np.float32),
        },
        "bn": {
            "scale": np.asarray(sd[f"{base}.conv_block.1.weight"]).astype(np.float32),
            "bias": np.asarray(sd[f"{base}.conv_block.1.bias"]).astype(np.float32),
        },
    }
    stats = {
        "bn": {
            "mean": np.asarray(sd[f"{base}.conv_block.1.running_mean"]).astype(np.float32),
            "var": np.asarray(sd[f"{base}.conv_block.1.running_var"]).astype(np.float32),
        }
    }
    return params, stats


def _conv_transpose_bn(sd, base):
    """Conv2dTranspose block -> ConvTransposeBN. torch ConvTranspose2d
    weight [in, out, kh, kw] computes a gradient-style (spatially
    flipped) conv; flax ConvTranspose(transpose_kernel=False) expects a
    forward-conv kernel [kh, kw, in, out], so flip the spatial dims."""
    w = np.asarray(sd[f"{base}.conv_block.0.weight"])
    params = {
        "conv": {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].astype(np.float32),
            "bias": np.asarray(sd[f"{base}.conv_block.0.bias"]).astype(np.float32),
        },
        "bn": {
            "scale": np.asarray(sd[f"{base}.conv_block.1.weight"]).astype(np.float32),
            "bias": np.asarray(sd[f"{base}.conv_block.1.bias"]).astype(np.float32),
        },
    }
    stats = {
        "bn": {
            "mean": np.asarray(sd[f"{base}.conv_block.1.running_mean"]).astype(np.float32),
            "var": np.asarray(sd[f"{base}.conv_block.1.running_var"]).astype(np.float32),
        }
    }
    return params, stats


def _convert_audio_encoder(sd, prefix="audio_encoder", n_layers=13):
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"l{i}"], stats[f"l{i}"] = _conv_bn(sd, f"{prefix}.{i}")
    return params, stats


def convert_wav2lip(sd: Dict) -> Dict:
    """Wav2Lip generator state_dict (wav_models/wav2lip.py:8-125) ->
    flax Wav2Lip variables (models/wav2lip.py)."""
    params: Dict = {}
    stats: Dict = {}
    enc_sizes = [1, 3, 4, 3, 3, 2, 2]
    for bi, n in enumerate(enc_sizes):
        for li in range(n):
            params[f"face_enc_{bi}_{li}"], stats[f"face_enc_{bi}_{li}"] = \
                _conv_bn(sd, f"face_encoder_blocks.{bi}.{li}")
    params["audio_encoder"], stats["audio_encoder"] = _convert_audio_encoder(sd)
    dec_sizes = [1, 2, 3, 3, 3, 3, 3]
    for bi, n in enumerate(dec_sizes):
        if bi == 0:
            params["face_dec_0_0"], stats["face_dec_0_0"] = _conv_bn(
                sd, "face_decoder_blocks.0.0"
            )
            continue
        params[f"face_dec_{bi}_t"], stats[f"face_dec_{bi}_t"] = \
            _conv_transpose_bn(sd, f"face_decoder_blocks.{bi}.0")
        for li in range(1, n):
            key = f"face_dec_{bi}_{li-1}"
            params[key], stats[key] = _conv_bn(
                sd, f"face_decoder_blocks.{bi}.{li}"
            )
    params["out_conv"], stats["out_conv"] = _conv_bn(sd, "output_block.0")
    w = np.asarray(sd["output_block.1.weight"])
    params["out_rgb"] = {
        "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
        "bias": np.asarray(sd["output_block.1.bias"]).astype(np.float32),
    }
    return {"params": params, "batch_stats": stats}


def convert_syncnet(sd: Dict) -> Dict:
    """SyncNet_color state_dict (wav_models/syncnet.py:7-70) -> flax
    SyncNetColor variables."""
    params: Dict = {}
    stats: Dict = {}
    for i in range(17):
        params[f"face_{i}"], stats[f"face_{i}"] = _conv_bn(
            sd, f"face_encoder.{i}"
        )
    # syncnet's audio encoder has 14 layers (extra 256-residual)
    params["audio_encoder"], stats["audio_encoder"] = _convert_audio_encoder(
        sd, n_layers=14
    )
    return {"params": params, "batch_stats": stats}


def convert_s3fd(sd: Dict) -> Dict:
    """s3fd state_dict (face_detection/detection/sfd/net_s3fd.py:22-130)
    -> flax S3FD params. Layer names match 1:1; Conv2d kernels go
    [out,in,kh,kw] -> [kh,kw,in,out], L2Norm weights copy through."""
    params: Dict = {}
    for k in sd:
        if not k.endswith(".weight"):
            continue
        name = k[: -len(".weight")]
        w = np.asarray(sd[k])
        if w.ndim == 4:
            params[name] = {
                "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                "bias": np.asarray(sd[f"{name}.bias"]).astype(np.float32),
            }
        else:  # L2Norm scale vectors
            params[name] = {"weight": w.astype(np.float32)}
    return {"params": params}


def _bn2(sd, base):
    p = {
        "scale": np.asarray(sd[f"{base}.weight"]).astype(np.float32),
        "bias": np.asarray(sd[f"{base}.bias"]).astype(np.float32),
    }
    s = {
        "mean": np.asarray(sd[f"{base}.running_mean"]).astype(np.float32),
        "var": np.asarray(sd[f"{base}.running_var"]).astype(np.float32),
    }
    return p, s


def _conv_nobias(sd, base):
    w = np.asarray(sd[f"{base}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}


def convert_iresnet(sd: Dict, layers=(2, 2, 2, 2)) -> Dict:
    """ArcFace iresnet state_dict (backbones/iresnet.py:67-140) -> flax
    IResNet variables. The fc flatten order differs (torch NCHW c*H*W+h*W+w
    vs flax NHWC h*W*C+w*C+c), so fc weight columns are permuted."""
    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = _conv_nobias(sd, "conv1")
    params["bn1"], stats["bn1"] = _bn2(sd, "bn1")
    params["prelu"] = {"alpha": np.asarray(sd["prelu.weight"]).astype(np.float32)}
    for li, n in enumerate(layers):
        for b in range(n):
            base = f"layer{li+1}.{b}"
            name = f"layer{li+1}_{b}"
            p: Dict = {}
            s: Dict = {}
            p["bn1"], s["bn1"] = _bn2(sd, f"{base}.bn1")
            p["conv1"] = _conv_nobias(sd, f"{base}.conv1")
            p["bn2"], s["bn2"] = _bn2(sd, f"{base}.bn2")
            p["prelu"] = {
                "alpha": np.asarray(sd[f"{base}.prelu.weight"]).astype(np.float32)
            }
            p["conv2"] = _conv_nobias(sd, f"{base}.conv2")
            p["bn3"], s["bn3"] = _bn2(sd, f"{base}.bn3")
            if f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_nobias(sd, f"{base}.downsample.0")
                p["down_bn"], s["down_bn"] = _bn2(sd, f"{base}.downsample.1")
            params[name], stats[name] = p, s
    params["bn2"], stats["bn2"] = _bn2(sd, "bn2")
    w = np.asarray(sd["fc.weight"])                 # [out, C*H*W]
    out_f = w.shape[0]
    c = 512
    hw = w.shape[1] // c
    h = int(np.sqrt(hw))
    k = (w.reshape(out_f, c, h, h).transpose(2, 3, 1, 0)
         .reshape(h * h * c, out_f))
    params["fc"] = {
        "kernel": k.astype(np.float32),
        "bias": np.asarray(sd["fc.bias"]).astype(np.float32),
    }
    params["features"], stats["features"] = _bn2(sd, "features")
    return {"params": params, "batch_stats": stats}


def convert_bisenet(sd: Dict) -> Dict:
    """BiSeNet face-parsing state_dict (DataProcess/BiSeNet.py:227-256)
    -> flax BiSeNet variables. ContextPath flattens (cp.* -> top level),
    BiSeNetOutput heads map to `{name}_conv` / `{name}_out`."""
    params: Dict = {}
    stats: Dict = {}

    def conv_bn_relu(name, base):
        p = {"conv": _conv_nobias(sd, f"{base}.conv")}
        p["bn"], s = _bn2(sd, f"{base}.bn")
        params[name] = p
        stats[name] = {"bn": s}

    # resnet18 trunk (DataProcess/resnet.py:59-80)
    rp: Dict = {"conv1": _conv_nobias(sd, "cp.resnet.conv1")}
    rs: Dict = {}
    rp["bn1"], rs["bn1"] = _bn2(sd, "cp.resnet.bn1")
    for li in range(1, 5):
        for b in range(2):
            base = f"cp.resnet.layer{li}.{b}"
            name = f"layer{li}_{b}"
            p: Dict = {"conv1": _conv_nobias(sd, f"{base}.conv1"),
                       "conv2": _conv_nobias(sd, f"{base}.conv2")}
            s: Dict = {}
            p["bn1"], s["bn1"] = _bn2(sd, f"{base}.bn1")
            p["bn2"], s["bn2"] = _bn2(sd, f"{base}.bn2")
            if f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_nobias(sd, f"{base}.downsample.0")
                p["down_bn"], s["down_bn"] = _bn2(sd, f"{base}.downsample.1")
            rp[name], rs[name] = p, s
    params["resnet"], stats["resnet"] = rp, rs

    conv_bn_relu("conv_avg", "cp.conv_avg")
    conv_bn_relu("conv_head32", "cp.conv_head32")
    conv_bn_relu("conv_head16", "cp.conv_head16")
    for arm in ("arm16", "arm32"):
        conv_bn_relu(arm, f"cp.{arm}.conv")
        params[arm]["conv"] = {"conv": params[arm].pop("conv"),
                               "bn": params[arm].pop("bn")}
        stats[arm] = {"conv": stats[arm]}
        params[arm]["conv_atten"] = _conv_nobias(sd, f"cp.{arm}.conv_atten")
        bp, bs = _bn2(sd, f"cp.{arm}.bn_atten")
        params[arm]["bn_atten"] = bp
        stats[arm]["bn_atten"] = bs
    conv_bn_relu("ffm_convblk", "ffm.convblk")
    params["ffm"] = {
        "convblk": params.pop("ffm_convblk"),
        "conv1": {
            "kernel": np.asarray(sd["ffm.conv1.weight"])
            .transpose(2, 3, 1, 0).astype(np.float32),
        },
        "conv2": {
            "kernel": np.asarray(sd["ffm.conv2.weight"])
            .transpose(2, 3, 1, 0).astype(np.float32),
        },
    }
    stats["ffm"] = {"convblk": stats.pop("ffm_convblk")}
    for head in ("conv_out", "conv_out16", "conv_out32"):
        conv_bn_relu(f"{head}_conv", f"{head}.conv")
        params[f"{head}_out"] = _conv_nobias(sd, f"{head}.conv_out")
    return {"params": params, "batch_stats": stats}


def convert_recon_net(sd: Dict) -> Dict:
    """Deep3DFaceRecon ReconNetWrapper state_dict
    (s_face3d/models/networks.py:69-104, resnet50 + 7 conv1x1 coeff
    heads) -> flax ReconNet variables. The per-coefficient heads
    (id80/exp64/tex80/angle3/gamma27/txy2/tz1) stack into the single
    257-wide dense head."""
    params: Dict = {}
    stats: Dict = {}
    bp: Dict = {"conv1": _conv_nobias(sd, "backbone.conv1")}
    bs: Dict = {}
    bp["bn1"], bs["bn1"] = _bn2(sd, "backbone.bn1")
    for li, n in enumerate((3, 4, 6, 3)):
        for b in range(n):
            base = f"backbone.layer{li+1}.{b}"
            name = f"layer{li+1}_{b}"
            p: Dict = {}
            s: Dict = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = _conv_nobias(sd, f"{base}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = _bn2(sd, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_nobias(sd, f"{base}.downsample.0")
                p["down_bn"], s["down_bn"] = _bn2(sd, f"{base}.downsample.1")
            bp[name], bs[name] = p, s
    params["backbone"], stats["backbone"] = bp, bs
    ks, bs_ = [], []
    for i in range(7):
        w = np.asarray(sd[f"final_layers.{i}.weight"])[:, :, 0, 0]  # [out,in]
        ks.append(w.T)
        bs_.append(np.asarray(sd[f"final_layers.{i}.bias"]))
    params["final"] = {
        "kernel": np.concatenate(ks, axis=1).astype(np.float32),
        "bias": np.concatenate(bs_).astype(np.float32),
    }
    return {"params": params, "batch_stats": stats}


def convert_au_classifier(sd: Dict) -> Dict:
    """classifier_AU state_dict (StandardizedSpace/main/train_vq.py:60-93)
    -> flax AUClassifier params. linear0's input columns are permuted from
    the torch NCHW flatten (c*25+h*5+w) to the NHWC flatten."""
    params: Dict = {}
    for i in range(1, 5):
        w = np.asarray(sd[f"conv{i}.0.weight"])
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": np.asarray(sd[f"conv{i}.0.bias"]).astype(np.float32),
        }
    w0 = np.asarray(sd["linear0.0.weight"])          # [1600, 128*5*5]
    w0 = (w0.reshape(-1, 128, 5, 5).transpose(2, 3, 1, 0)
          .reshape(5 * 5 * 128, -1))
    params["linear0"] = {
        "kernel": w0.astype(np.float32),
        "bias": np.asarray(sd["linear0.0.bias"]).astype(np.float32),
    }
    for i in (1, 2, 3):
        params[f"linear{i}"] = _dense(sd, f"linear{i}.0")
    params["linear4"] = _dense(sd, "linear4")
    return {"params": params}


def _resnet50_trunk(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """torch resnet50 trunk (DECA-style lipsrc/models/resnet.py:23-88 /
    torchvision layout) -> (params, batch_stats) for models.resnets.ResNet50."""
    pfx = f"{prefix}." if prefix else ""
    bp: Dict = {"conv1": _conv_nobias(sd, f"{pfx}conv1")}
    bs: Dict = {}
    bp["bn1"], bs["bn1"] = _bn2(sd, f"{pfx}bn1")
    for li, n in enumerate((3, 4, 6, 3)):
        for b in range(n):
            base = f"{pfx}layer{li+1}.{b}"
            name = f"layer{li+1}_{b}"
            p: Dict = {}
            s: Dict = {}
            for ci in (1, 2, 3):
                p[f"conv{ci}"] = _conv_nobias(sd, f"{base}.conv{ci}")
                p[f"bn{ci}"], s[f"bn{ci}"] = _bn2(sd, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_nobias(sd, f"{base}.downsample.0")
                p["down_bn"], s["down_bn"] = _bn2(sd, f"{base}.downsample.1")
            bp[name], bs[name] = p, s
    return bp, bs


def convert_spectre_flame_encoder(sd: Dict) -> Dict:
    """SPECTRE E_flame (ResnetEncoder, lipsrc/models/encoders.py:66-86:
    resnet50 trunk + Linear(2048,1024) + ReLU + Linear(1024,236)) ->
    models.spectre.SpectreEncoder variables."""
    ep, es = _resnet50_trunk(sd, "encoder")
    params = {
        "encoder": ep,
        "fc0": _dense(sd, "layers.0"),
        "fc1": _dense(sd, "layers.2"),
    }
    return {"params": params, "batch_stats": {"encoder": es}}


def convert_spectre_perceptual_encoder(sd: Dict) -> Dict:
    """SPECTRE E_expression (PerceptualEncoder resnet50 variant,
    lipsrc/models/encoders.py:8-63: trunk -> Conv1d(2048,256,k5) + BN1d +
    ReLU -> Linear(256,53)) -> models.spectre.PerceptualExpressionEncoder
    variables. Conv1d weight [out, in, k] -> flax [k, in, out]."""
    bp, bs = _resnet50_trunk(sd, "encoder")
    tbn_p, tbn_s = _bn2(sd, "temporal.1")
    params = {
        "backbone": bp,
        "temporal": {
            "kernel": np.asarray(sd["temporal.0.weight"])
            .transpose(2, 1, 0).astype(np.float32),
            "bias": np.asarray(sd["temporal.0.bias"]).astype(np.float32),
        },
        "temporal_bn": tbn_p,
        "head": _dense(sd, "layers.0"),
    }
    return {
        "params": params,
        "batch_stats": {"backbone": bs, "temporal_bn": tbn_s},
    }


def _convtranspose2d(sd, base, flip: bool = True):
    """torch ConvTranspose2d weight [in, out, kh, kw] -> flax
    ConvTranspose kernel [kh, kw, in, out]. torch's transposed conv is
    the gradient of a correlation (kernel spatially flipped relative to
    flax's unflipped fractionally-strided conv), hence the flip."""
    w = np.asarray(sd[f"{base}.weight"])
    w = w.transpose(2, 3, 0, 1)
    if flip:
        w = w[::-1, ::-1]
    return {"kernel": w.astype(np.float32),
            "bias": np.asarray(sd[f"{base}.bias"]).astype(np.float32)}


def _conv_bias(sd, base):
    w = np.asarray(sd[f"{base}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": np.asarray(sd[f"{base}.bias"]).astype(np.float32)}


def _resunet2d(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """s_audio2pose_models/res_unet.py ResUnet state_dict -> (params,
    batch_stats) for models.audio2pose.ResUnet2D."""
    p: Dict = {}
    s: Dict = {}
    p["in_conv1"] = _conv_bias(sd, f"{prefix}.input_layer.0")
    p["in_bn"], s["in_bn"] = _bn2(sd, f"{prefix}.input_layer.1")
    p["in_conv2"] = _conv_bias(sd, f"{prefix}.input_layer.3")
    p["in_skip"] = _conv_bias(sd, f"{prefix}.input_skip.0")
    blocks = {
        "res1": "residual_conv_1", "res2": "residual_conv_2",
        "bridge": "bridge", "upres1": "up_residual_conv1",
        "upres2": "up_residual_conv2", "upres3": "up_residual_conv3",
    }
    for dst, src in blocks.items():
        bp: Dict = {}
        bs: Dict = {}
        bp["bn1"], bs["bn1"] = _bn2(sd, f"{prefix}.{src}.conv_block.0")
        bp["conv1"] = _conv_bias(sd, f"{prefix}.{src}.conv_block.2")
        bp["bn2"], bs["bn2"] = _bn2(sd, f"{prefix}.{src}.conv_block.3")
        bp["conv2"] = _conv_bias(sd, f"{prefix}.{src}.conv_block.5")
        bp["skip_conv"] = _conv_bias(sd, f"{prefix}.{src}.conv_skip.0")
        bp["skip_bn"], bs["skip_bn"] = _bn2(sd, f"{prefix}.{src}.conv_skip.1")
        p[dst], s[dst] = bp, bs
    for i in (1, 2, 3):
        p[f"up{i}"] = _convtranspose2d(sd, f"{prefix}.upsample_{i}.upsample")
    p["out_conv"] = _conv_bias(sd, f"{prefix}.output_layer.0")
    return p, s


def convert_audio2pose_cvae(sd: Dict) -> Dict:
    """SadTalker Audio2Pose CVAE state_dict (s_audio2pose_models/cvae.py
    ENCODER+DECODER incl. the 2D ResUnet pose embedders) ->
    models.audio2pose.Audio2PoseCVAE variables."""
    params: Dict = {}
    stats: Dict = {}
    for side in ("encoder", "decoder"):
        p: Dict = {}
        s: Dict = {}
        p["resunet"], s["resunet"] = _resunet2d(sd, f"{side}.resunet")
        i = 0
        while f"{side}.MLP.L{i}.weight" in sd:
            p[f"L{i}"] = _dense(sd, f"{side}.MLP.L{i}")
            i += 1
        p["linear_audio"] = _dense(sd, f"{side}.linear_audio")
        p["classbias"] = np.asarray(sd[f"{side}.classbias"]).astype(np.float32)
        if side == "encoder":
            p["linear_means"] = _dense(sd, f"{side}.linear_means")
            p["linear_logvar"] = _dense(sd, f"{side}.linear_logvar")
        else:
            p["pose_linear"] = _dense(sd, f"{side}.pose_linear")
        params[side], stats[side] = p, s
    return {"params": params, "batch_stats": stats}


def convert_pose_discriminator(sd: Dict) -> Dict:
    """s_audio2pose_models/discriminator.py PoseSequenceDiscriminator
    state_dict -> models.audio2pose.PoseSequenceDiscriminator variables.
    Conv1d weight [out, in, k] -> flax [k, in, out]."""

    def conv1d(base, bias):
        w = np.asarray(sd[f"{base}.weight"]).transpose(2, 1, 0)
        out = {"kernel": w.astype(np.float32)}
        if bias:
            out["bias"] = np.asarray(sd[f"{base}.bias"]).astype(np.float32)
        return out

    params: Dict = {}
    stats: Dict = {}
    for i in range(3):
        bnp, bns = _bn2(sd, f"seq.{i}.norm")
        params[f"seq{i}"] = {"conv": conv1d(f"seq.{i}.conv", bias=False),
                             "norm": bnp}
        stats[f"seq{i}"] = {"norm": bns}
    params["out"] = conv1d("seq.3", bias=True)
    return {"params": params, "batch_stats": stats}
