"""Flagship-shape sharded-step HLO assertions (VERDICT r3 next-round #3).

AOT-lowers (compile only, no execution) the FULL Reso64 fused train step
over the 8-device virtual mesh (data=2 x rays=4) and asserts on the
optimized HLO that the collective structure is right:

  * weight-gradient psums exist (all-reduce) — the DP grad exchange the
    reference gets from DDP/NCCL (train_vq.py:98-122, partial_fc.py:151-222);
  * NO all-gather materializes a ray-sample-sized `[B, R*NS, ...]`
    operand — the ray axis must stay sharded through the kernel; only
    the post-composite featmap gather (~MBs) is legitimate.

This test fails if someone re-introduces a gather on the ray axis.
"""

import re

import jax
import numpy as np
import pytest

from nerf3dtalker_tpu.config import TrainConfig, reso64
from nerf3dtalker_tpu.parallel import make_mesh
from nerf3dtalker_tpu.train.step import build_step_fns

# Anything all-gathered above this is a ray-sample tensor leak: the
# legitimate post-composite featmap gather at Reso64 is
# [B=2, 4096 rays, 256ch] * f32 = 8.4 MB; a [B, R*NS=262144, 384] sample
# tensor is >= 200 MB.
_MAX_ALLGATHER_BYTES = 64 * 1024 * 1024

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _result_region(line: str, op: str) -> str:
    """The result-type region of an HLO op line.

    Compiled HLO text puts the result shape AFTER the '=' and BEFORE the
    op name: `%all-gather.1 = f32[2,64]{1,0} all-gather(f32[...] %x)` —
    so the region to parse is rhs up to the first op-name occurrence.
    (An earlier revision parsed the lhs, which never contains a shape,
    making the assertion vacuous.)"""
    if "=" not in line:
        return ""
    rhs = line.split("=", 1)[1]
    return rhs.split(op, 1)[0]


def _shapes_bytes(line: str, op: str = "all-gather"):
    """Byte sizes of every result shape of an HLO `op` line."""
    out = []
    for m in re.finditer(r"([a-z]+\d*)\[([\d,]*)\]", _result_region(line, op)):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * _DTYPE_BYTES.get(dt, 4))
    return out


def test_hlo_shape_parser_is_not_vacuous():
    """The parser must actually see result shapes on real-format HLO op
    lines — guards against the lhs/rhs regression that silently disabled
    the all-gather assertions."""
    line = ("  %all-gather.1 = f32[2,262144,384]{2,1,0} "
            "all-gather(f32[2,65536,384]{2,1,0} %p), dimensions={1}")
    assert _shapes_bytes(line) == [2 * 262144 * 384 * 4]
    tup = ("  %ag = (bf16[4,4096,256]{2,1,0}, u32[]) "
           "all-gather(bf16[4,1024,256]{2,1,0} %x)")
    got = _shapes_bytes(tup)
    assert 4 * 4096 * 256 * 2 in got
    # operand shapes (inside the call) must NOT be counted
    assert 2 * 65536 * 384 * 4 not in _shapes_bytes(line)


@pytest.fixture(scope="module")
def flagship_hlo():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=2, rays=4)
    cfg = reso64()
    # VGG off: the perceptual net is replicated dense math with no
    # cross-device traffic; leaving it out keeps the compile tractable
    # while preserving every collective under test (render + grads)
    tc = TrainConfig(bf16_compute=True, use_vgg_loss=False)
    fns = build_step_fns(cfg, tc, mesh=mesh, use_fused=True)

    B, R = 2, cfg.n_rays
    f32 = np.float32
    S = cfg.pred_img_size
    abstract = {
        "mels": jax.ShapeDtypeStruct((B, 80, 16), f32),
        "gt_rgb": jax.ShapeDtypeStruct((B, S, S, 3), f32),
        "head_mask": jax.ShapeDtypeStruct((B, S, S, 1), f32),
        "iden": jax.ShapeDtypeStruct((B, 100), f32),
        "expr": jax.ShapeDtypeStruct((B, 79), f32),
        "text": jax.ShapeDtypeStruct((B, 100), f32),
        "illu": jax.ShapeDtypeStruct((B, 27), f32),
        "audio_exp": jax.ShapeDtypeStruct((B, 64), f32),
        "Rmat": jax.ShapeDtypeStruct((B, 3, 3), f32),
        "Tvec": jax.ShapeDtypeStruct((B, 3), f32),
        "inv_inmat": jax.ShapeDtypeStruct((B, 3, 3), f32),
        "xy": jax.ShapeDtypeStruct((B, R, 2), f32),
    }
    rng = jax.random.key(0)
    # abstract init: shapes without running the Reso64 model on CPU
    state_shape = jax.eval_shape(fns.init, rng, abstract)
    lowered = fns.train_step_aot.lower(state_shape, abstract, rng)
    compiled = lowered.compile()
    return compiled.as_text()


def test_weight_grad_psum_present(flagship_hlo):
    assert "all-reduce" in flagship_hlo, (
        "no all-reduce in the sharded train step — weight-grad psum missing"
    )


def test_no_ray_axis_allgather(flagship_hlo):
    offenders = []
    for line in flagship_hlo.splitlines():
        if "all-gather" not in line:
            continue
        for nbytes in _shapes_bytes(line):
            if nbytes > _MAX_ALLGATHER_BYTES:
                offenders.append((nbytes, line.strip()[:160]))
    assert not offenders, (
        "ray-sample-sized all-gather(s) in the sharded step "
        f"(> {_MAX_ALLGATHER_BYTES} B): {offenders}"
    )


def test_no_full_sample_tensor_materialized(flagship_hlo):
    """The [B, R*NS, hidden] sample tensor (262144 rows at Reso64) must
    never appear unsharded in any collective's result."""
    cfg = reso64()
    full = cfg.n_rays * cfg.num_sample_coarse   # 262144
    pat = re.compile(r"\[[\d,]*\b" + str(full) + r"\b[\d,]*\]")
    for line in flagship_hlo.splitlines():
        for op in ("all-gather", "all-reduce", "collective-permute"):
            if op in line:
                assert not pat.search(_result_region(line, op)), (
                    f"full sample axis in a collective result: "
                    f"{line.strip()[:200]}"
                )
