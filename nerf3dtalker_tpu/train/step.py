"""Jittable training / eval steps for the HeadNeRF + Audio2Style pair.

Mirrors the reference training loop semantics (talker_trainer.py:960-1085):
two Adam optimizers — one on the NeRF, one on the audio encoder
(talker_trainer.py:665,722-727) — stepping together on the total loss, with
StepLR decay (gamma 0.1 every 100 epochs). Here both live in one optax
multi-transform over a single param pytree, and the whole step (audio
encode -> code assembly -> render -> loss -> grads -> update) is one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.models.audio import Audio2Style
from nerf3dtalker_tpu.train.losses import headnerf_losses


class TrainState(NamedTuple):
    params: Any            # {"nerf": ..., "audio": ...}
    opt_state: Any
    step: jnp.ndarray


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """StepLR: lr * gamma^(epoch // step_size) (talker_trainer.py:722-727)."""
    return optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.step_lr_every * max(steps_per_epoch, 1),
        decay_rate=cfg.step_lr_gamma,
        staircase=True,
    )


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    sched = make_schedule(cfg, steps_per_epoch)
    return optax.multi_transform(
        {
            "nerf": optax.adam(sched),
            "audio": optax.adam(cfg.lr_audio),
        },
        param_labels={"nerf": "nerf", "audio": "audio"},
    )


@dataclasses.dataclass(frozen=True)
class StepFns:
    """Bundle of jittable functions for one model configuration.

    `train_step_aot` is the underlying jit object (with its shardings
    baked in) for AOT lowering/compile-only inspection — used by the
    sharded-HLO collective assertions in tests/test_aot_sharded_hlo.py.
    """

    train_step: Any
    eval_step: Any
    render: Any
    init: Any
    train_step_aot: Any = None


def build_step_fns(
    nerf_cfg: NeRFConfig,
    train_cfg: TrainConfig,
    steps_per_epoch: int = 1,
    vgg_params=None,
    compute_dtype=None,
    mesh=None,
    use_fused: Optional[bool] = None,
    precomputed_vgg: bool = False,
) -> StepFns:
    """Construct (train_step, eval_step, render, init) closures.

    Batch layout (all arrays, precomputed offline — SURVEY.md §7
    'Precompute, don't inline'):
      mels       [B, 80, 16]   per-frame mel chunks
      gt_rgb     [B, H, W, 3]
      head_mask  [B, H, W, 1]
      iden/expr/text/illu codes, audio_exp [B, 64] (SadTalker exp)
      Rmat [B,3,3], Tvec [B,3], inv_inmat [B,3,3]
      xy [B, N_r, 2]
    """
    cdt = compute_dtype or (jnp.bfloat16 if train_cfg.bf16_compute else jnp.float32)
    if use_fused is None:
        # default to the fused Pallas render on real TPU backends (single
        # chip AND meshed — fused_render_spmd handles the sharded case);
        # on CPU the default is the jnp oracle, but callers can force
        # use_fused=True to exercise the kernel via interpret mode
        use_fused = jax.default_backend() not in ("cpu",)
    fused_interpret = bool(use_fused) and jax.default_backend() == "cpu"
    # the train step only differentiates w.r.t. parameters, so the fused
    # backward can skip the d_pe/d_zd/d_zv outputs (saves ~270 MB HBM
    # writes/step at Reso64; the fitting drivers keep input grads on)
    model = HeadNeRF(
        nerf_cfg, compute_dtype=cdt, use_fused=use_fused,
        fused_interpret=fused_interpret,
        fused_input_grads=False,
        fused_mesh=mesh if use_fused else None,
    )
    audio_model = Audio2Style()
    optimizer = make_optimizer(train_cfg, steps_per_epoch)

    def assemble_codes(batch, audio_exp):
        expr = batch["expr"]
        if audio_exp is not None:
            # audio-predicted exp overwrites expr[:64] (talker_trainer.py:853)
            expr = jnp.concatenate([audio_exp, expr[:, 64:]], axis=-1)
        shape_code = jnp.concatenate([batch["iden"], expr], axis=-1)
        appea_code = jnp.concatenate([batch["text"], batch["illu"]], axis=-1)
        return shape_code, appea_code

    def forward(params, batch, rng, deterministic):
        audio_style = audio_model.apply(
            params["audio"], batch["mels"], deterministic=deterministic,
            rngs=None if deterministic else {"dropout": rng},
        )
        shape_code, appea_code = assemble_codes(batch, batch.get("audio_exp"))
        pred = model.apply(
            params["nerf"],
            batch_xy=batch["xy"],
            shape_code=shape_code,
            appea_code=appea_code,
            audio_style=audio_style,
            Rmat=batch["Rmat"],
            Tvec=batch["Tvec"],
            inv_inmat=batch["inv_inmat"],
            rng=None if deterministic else rng,
        )
        return pred

    # VGG perceptual loss runs at the step compute dtype (bf16 AMP policy)
    # and, when the dataset carries precomputed masked-GT activations
    # (FrameDataset.precompute_gt_vgg), skips the target branch entirely
    vgg_cdt = cdt if cdt == jnp.bfloat16 else None

    def _gt_feats(batch):
        if precomputed_vgg:
            return [batch[f"vgg_f{i}"] for i in range(4)]
        return None

    def _filter(batch):
        # datasets may carry precomputed VGG planes the step isn't using;
        # drop them so the jitted pytree/sharding structures stay fixed
        if precomputed_vgg:
            return batch
        return {k: v for k, v in batch.items() if not k.startswith("vgg_f")}

    def loss_fn(params, batch, rng):
        pred = forward(params, batch, rng, deterministic=False)
        losses = headnerf_losses(
            pred, batch["gt_rgb"], batch["head_mask"],
            bg_value=1.0 if nerf_cfg.bg_type == "white" else 0.0,
            vgg_params=vgg_params, vgg_compute_dtype=vgg_cdt,
            gt_vgg_feats=_gt_feats(batch),
        )
        return losses["total_loss"], losses

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        from nerf3dtalker_tpu.utils.guards import guarded_update, tree_select

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # skip the update when gradients are non-finite (first-class version
        # of the reference's isnan warning, talker_trainer.py:1071-1073);
        # the optimizer state is guarded with the same flag so a NaN step
        # can't poison Adam's moments
        new_params, ok = guarded_update(state.params, new_params, grads)
        new_opt = tree_select(ok, new_opt, state.opt_state)
        losses = {**losses, "finite_step": ok.astype(jnp.float32)}
        return TrainState(new_params, new_opt, state.step + 1), losses

    def eval_step(params, batch):
        pred = forward(params, batch, rng=jax.random.key(0), deterministic=True)
        losses = headnerf_losses(
            pred, batch["gt_rgb"], batch["head_mask"],
            bg_value=1.0 if nerf_cfg.bg_type == "white" else 0.0,
            vgg_params=vgg_params, vgg_compute_dtype=vgg_cdt,
            gt_vgg_feats=_gt_feats(batch),
        )
        return pred["merge_img"], losses

    def render(params, batch):
        return forward(params, batch, rng=jax.random.key(0), deterministic=True)

    def init(rng: jax.Array, batch: Dict) -> TrainState:
        r1, r2 = jax.random.split(rng)
        nerf_params = model.init(
            r1,
            batch_xy=batch["xy"],
            shape_code=jnp.zeros((1, nerf_cfg.shape_code_dims)),
            appea_code=jnp.zeros((1, nerf_cfg.appea_code_dims)),
            audio_style=jnp.zeros((1, nerf_cfg.audio_style_dims)),
            Rmat=batch["Rmat"][:1],
            Tvec=batch["Tvec"][:1],
            inv_inmat=batch["inv_inmat"][:1],
        )
        audio_params = audio_model.init(r2, batch["mels"])
        params = {"nerf": nerf_params, "audio": audio_params}
        return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    if mesh is None:
        jit_train = jax.jit(train_step)
        jit_eval = jax.jit(eval_step)
        return StepFns(
            train_step=lambda st, b, r: jit_train(st, _filter(b), r),
            eval_step=lambda p, b: jit_eval(p, _filter(b)),
            render=jax.jit(render),
            init=init,
            train_step_aot=jit_train,
        )

    # ---- multi-chip: batch over "data", rays over "rays", params
    # replicated; gradient psum over ICI is inserted (and overlapped with
    # backward) by XLA — the DDP equivalent (SURVEY.md §2.9 P2/P6).
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    ray_sh = NamedSharding(mesh, P("data", "rays"))
    batch_sh = {
        "mels": data_sh, "gt_rgb": data_sh, "head_mask": data_sh,
        "iden": data_sh, "expr": data_sh, "text": data_sh, "illu": data_sh,
        "audio_exp": data_sh, "Rmat": data_sh, "Tvec": data_sh,
        "inv_inmat": data_sh, "xy": ray_sh,
    }
    if precomputed_vgg:
        for i in range(4):
            batch_sh[f"vgg_f{i}"] = data_sh
    jit_train = jax.jit(
        train_step, in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
    )
    jit_eval = jax.jit(
        eval_step, in_shardings=(repl, batch_sh),
        out_shardings=(data_sh, repl),
    )
    render_sh = {k: v for k, v in batch_sh.items()
                 if not k.startswith("vgg_f")}
    jit_render = jax.jit(render, in_shardings=(repl, render_sh))
    return StepFns(
        train_step=lambda st, b, r: jit_train(st, _filter(b), r),
        eval_step=lambda p, b: jit_eval(p, _filter(b)),
        render=lambda p, b: jit_render(
            p, {k: v for k, v in b.items() if k in render_sh}
        ),
        init=init,
        train_step_aot=jit_train,
    )
