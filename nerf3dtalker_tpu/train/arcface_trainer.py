"""ArcFace recognition training with model-parallel PartialFC softmax.

Equivalent of reference `s_face3d/models/arcface_torch/train.py:20-141`:
IResNet backbone + margin softmax over millions of identities with the
class-center matrix sharded across devices (partial_fc.py), bf16 compute
replacing the fp16 AMP + MaxClipGradScaler (utils/utils_amp.py:14-79 — on
TPU bf16 needs no loss scaling), SGD with momentum + weight decay and
poly/step LR.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf3dtalker_tpu.models.resnets import IResNet
from nerf3dtalker_tpu.parallel.partial_fc import cosface_margin, sharded_softmax_ce


class ArcfaceTrainState(NamedTuple):
    backbone_params: Any          # trainable 'params' collection
    batch_stats: Any              # BN running stats (not optimized)
    fc_weight: jnp.ndarray        # [num_classes, embed] (sharded on "model")
    opt_state: Any
    step: jnp.ndarray


def build_arcface_step(
    mesh,
    num_classes: int,
    embed_dim: int = 512,
    layers=(2, 2, 2, 2),
    lr: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    margin=cosface_margin,
    input_size: int = 112,
):
    """Returns (init, train_step). Batch: images [B, S, S, 3], labels [B]."""
    net = IResNet(layers=layers, embed_dim=embed_dim, input_size=input_size)
    optimizer = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )
    margin_fn = margin()

    def loss_fn(trainable, batch_stats, batch):
        backbone_params, fc_weight = trainable
        emb, updates = net.apply(
            {"params": backbone_params, "batch_stats": batch_stats},
            batch["images"], train=True, mutable=["batch_stats"],
        )
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
        )
        w = fc_weight / jnp.maximum(
            jnp.linalg.norm(fc_weight, axis=-1, keepdims=True), 1e-8
        )
        loss = sharded_softmax_ce(
            mesh, emb, w, batch["labels"], axis="model", margin_logit_fn=margin_fn,
        )
        return loss, updates["batch_stats"]

    def init(rng, batch):
        r1, r2 = jax.random.split(rng)
        variables = net.init(r1, batch["images"][:1])
        fc = jax.random.normal(r2, (num_classes, embed_dim)) * 0.01
        trainable = (variables["params"], fc)
        return ArcfaceTrainState(
            variables["params"], variables.get("batch_stats", {}), fc,
            optimizer.init(trainable), jnp.zeros((), jnp.int32),
        )

    def train_step(state: ArcfaceTrainState, batch):
        trainable = (state.backbone_params, state.fc_weight)
        (loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, state.batch_stats, batch
        )
        updates, opt = optimizer.update(grads, state.opt_state, trainable)
        bp, fc = optax.apply_updates(trainable, updates)
        return (
            ArcfaceTrainState(bp, bn, fc, opt, state.step + 1),
            {"loss": loss},
        )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        model_sh = NamedSharding(mesh, P("model", None))
        state_sh = ArcfaceTrainState(repl, repl, model_sh, repl, repl)
        batch_sh = {"images": data, "labels": data}
        train_step = jax.jit(
            train_step, in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, repl),
        )
    else:
        train_step = jax.jit(train_step)
    return init, train_step
