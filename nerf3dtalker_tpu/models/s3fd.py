"""S3FD single-shot face detector (flax, NHWC) + bbox decode/NMS.

Equivalents of reference `face_detection/detection/sfd/net_s3fd.py:22-261`
(VGG trunk, L2Norm-scaled multi-scale heads, max-out background label on
the first head), `bbox.py` decode/nms, and the detect pipeline of
`detect.py`/`sfd_detector.py:16-60`. The per-scale anchor decode runs
vectorized in jnp; NMS is a small numpy postprocess (offline preprocessing
path — not perf-critical, SURVEY.md §7 Phase 7).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class L2Norm(nn.Module):
    """Channelwise L2 normalization with learned scale (net_s3fd.py L2Norm)."""

    scale_init: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", nn.initializers.constant(self.scale_init), (x.shape[-1],)
        )
        n = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True)) + 1e-10
        return x / n * w


class S3FD(nn.Module):
    """Returns [(cls, reg)] for 6 scales (strides 4..128)."""

    @nn.compact
    def __call__(self, x):
        def conv(c, k, s, p, name):
            return nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)], name=name)

        def relu_conv(h, c, k, s, p, name):
            return nn.relu(conv(c, k, s, p, name)(h))

        h = relu_conv(x, 64, 3, 1, 1, "conv1_1")
        h = relu_conv(h, 64, 3, 1, 1, "conv1_2")
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = relu_conv(h, 128, 3, 1, 1, "conv2_1")
        h = relu_conv(h, 128, 3, 1, 1, "conv2_2")
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = relu_conv(h, 256, 3, 1, 1, "conv3_1")
        h = relu_conv(h, 256, 3, 1, 1, "conv3_2")
        h = relu_conv(h, 256, 3, 1, 1, "conv3_3")
        f3_3 = h
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = relu_conv(h, 512, 3, 1, 1, "conv4_1")
        h = relu_conv(h, 512, 3, 1, 1, "conv4_2")
        h = relu_conv(h, 512, 3, 1, 1, "conv4_3")
        f4_3 = h
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = relu_conv(h, 512, 3, 1, 1, "conv5_1")
        h = relu_conv(h, 512, 3, 1, 1, "conv5_2")
        h = relu_conv(h, 512, 3, 1, 1, "conv5_3")
        f5_3 = h
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = relu_conv(h, 1024, 3, 1, 3, "fc6")
        h = relu_conv(h, 1024, 1, 1, 0, "fc7")
        ffc7 = h
        h = relu_conv(h, 256, 1, 1, 0, "conv6_1")
        h = relu_conv(h, 512, 3, 2, 1, "conv6_2")
        f6_2 = h
        h = relu_conv(h, 128, 1, 1, 0, "conv7_1")
        h = relu_conv(h, 256, 3, 2, 1, "conv7_2")
        f7_2 = h

        f3_3 = L2Norm(10.0, name="conv3_3_norm")(f3_3)
        f4_3 = L2Norm(8.0, name="conv4_3_norm")(f4_3)
        f5_3 = L2Norm(5.0, name="conv5_3_norm")(f5_3)

        heads = []
        specs = [
            (f3_3, 4, "conv3_3_norm"), (f4_3, 2, "conv4_3_norm"),
            (f5_3, 2, "conv5_3_norm"), (ffc7, 2, "fc7"),
            (f6_2, 2, "conv6_2"), (f7_2, 2, "conv7_2"),
        ]
        for feat, ncls, name in specs:
            cls = conv(ncls, 3, 1, 1, f"{name}_mbox_conf")(feat)
            reg = conv(4, 3, 1, 1, f"{name}_mbox_loc")(feat)
            heads.append((cls, reg))

        # max-out background label on the stride-4 head (net_s3fd.py:125-128)
        cls1, reg1 = heads[0]
        bg = jnp.max(cls1[..., :3], axis=-1, keepdims=True)
        heads[0] = (jnp.concatenate([bg, cls1[..., 3:]], axis=-1), reg1)
        return heads


def decode_boxes(loc: jnp.ndarray, priors: jnp.ndarray,
                 variances=(0.1, 0.2)) -> jnp.ndarray:
    """SSD box decode (bbox.py:91-108): center-offset + log-size."""
    cxcy = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * jnp.exp(loc[:, 2:] * variances[1])
    return jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)


def scale_priors(heads_shapes: List[Tuple[int, int]]) -> np.ndarray:
    """Anchor priors per scale: stride 4*2^i, anchor size 4*stride
    (detect.py anchor construction)."""
    priors = []
    for i, (fh, fw) in enumerate(heads_shapes):
        stride = 4 * (2 ** i)
        size = stride * 4
        ys, xs = np.mgrid[0:fh, 0:fw]
        cx = (xs + 0.5) * stride
        cy = (ys + 0.5) * stride
        p = np.stack(
            [cx, cy, np.full_like(cx, size), np.full_like(cy, size)], axis=-1
        ).reshape(-1, 4)
        priors.append(p)
    return np.concatenate(priors).astype(np.float32)


def detect_faces(params, img: jnp.ndarray, model: S3FD | None = None,
                 score_thresh: float = 0.5, nms_thresh: float = 0.3):
    """[1, H, W, 3] (RGB, mean-subtracted as in detect.py) -> [N, 5]
    (x1, y1, x2, y2, score) numpy boxes after NMS."""
    model = model or S3FD()
    heads = model.apply(params, img)
    shapes = [(c.shape[1], c.shape[2]) for c, _ in heads]
    priors = scale_priors(shapes)
    scores, locs = [], []
    for cls, reg in heads:
        prob = nn.softmax(cls, axis=-1)[..., 1]
        scores.append(prob.reshape(-1))
        locs.append(reg.reshape(-1, 4))
    scores = jnp.concatenate(scores)
    boxes = decode_boxes(jnp.concatenate(locs), jnp.asarray(priors))
    s = np.asarray(scores)
    b = np.asarray(boxes)
    keep = s > score_thresh
    return nms(np.concatenate([b[keep], s[keep, None]], axis=1), nms_thresh)


def nms(dets: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy IoU NMS (bbox.py:44-65)."""
    if len(dets) == 0:
        return dets
    x1, y1, x2, y2, s = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = s.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1 + 1) * np.maximum(0, yy2 - yy1 + 1)
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return dets[keep]


def smooth_boxes(boxes: np.ndarray, T: int = 5) -> np.ndarray:
    """Temporal box smoothing over a window (wav2lip-style
    get_smoothened_boxes, FittingSingleImage_new.py:462-469)."""
    out = boxes.copy()
    for i in range(len(boxes)):
        w = boxes[max(0, i - T // 2) : i + T // 2 + 1]
        out[i] = w.mean(axis=0)
    return out
