"""Model-parallel (sharded) softmax cross-entropy — the PartialFC pattern.

TPU-native re-design of the reference's ArcFace `PartialFC`
(s_face3d/models/arcface_torch/partial_fc.py:11-222): the class-center
weight matrix is split across ranks; the reference `all_gather`s features
and labels (:151,180), `all_reduce`s the max-logit and exp-sum for a stable
softmax (:188,193), and `reduce_scatter`s feature grads (:219).

Here the same communication pattern is expressed with `shard_map`
collectives over a mesh axis: `jax.lax.pmax` / `psum` replace the NCCL
all-reduces, and the feature-gradient reduce-scatter falls out of reverse-
mode AD through `psum` automatically — no hand-written backward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _local_ce(
    feats: jnp.ndarray,     # [B, D]   replicated activations
    weight: jnp.ndarray,    # [C_local, D] this shard's class centers
    labels: jnp.ndarray,    # [B] global class ids
    axis: str,
    margin_logit_fn=None,
):
    """Per-shard stable softmax CE with cross-shard psum/pmax."""
    n_local = weight.shape[0]
    shard = jax.lax.axis_index(axis)
    lo = shard * n_local

    logits = feats @ weight.T                                # [B, C_local]
    if margin_logit_fn is not None:
        local_lab = labels - lo
        in_shard = (local_lab >= 0) & (local_lab < n_local)
        logits = margin_logit_fn(logits, jnp.where(in_shard, local_lab, 0), in_shard)

    # stability shift only — gradient-free (pmax has no VJP, and the shift
    # cancels exactly in the CE gradient)
    gmax = jax.lax.stop_gradient(
        jax.lax.pmax(jnp.max(jax.lax.stop_gradient(logits), axis=-1), axis)
    )                                                        # [B]
    z = jnp.exp(logits - gmax[:, None])
    denom = jax.lax.psum(jnp.sum(z, axis=-1), axis)          # [B]

    local_lab = labels - lo
    in_shard = (local_lab >= 0) & (local_lab < n_local)
    safe_lab = jnp.where(in_shard, local_lab, 0)
    tgt_logit = jnp.take_along_axis(logits, safe_lab[:, None], axis=-1)[:, 0]
    tgt = jnp.where(in_shard, tgt_logit - gmax, 0.0)
    tgt = jax.lax.psum(tgt, axis)                            # each label lives
    # in exactly one shard, so the psum reconstructs the full target logit.
    loss = jnp.log(denom) - tgt
    return jnp.mean(loss)


def sharded_softmax_ce(
    mesh: Mesh,
    feats: jnp.ndarray,      # [B, D] (replicated over the model axis)
    weight: jnp.ndarray,     # [C, D] full class-center matrix (sharded dim 0)
    labels: jnp.ndarray,     # [B]
    axis: str = "model",
    margin_logit_fn=None,
) -> jnp.ndarray:
    """Mean CE loss with the classifier sharded over `axis`.

    Differentiable: grads w.r.t. `weight` stay shard-local; grads w.r.t.
    `feats` are psum-reduced across shards by AD (the reduce-scatter of
    partial_fc.py:219 in XLA form).
    """
    fn = shard_map(
        functools.partial(_local_ce, axis=axis, margin_logit_fn=margin_logit_fn),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P()),
        out_specs=P(),
    )
    return fn(feats, weight, labels)


def _local_sampled_ce(
    feats: jnp.ndarray,     # [B, D]
    weight: jnp.ndarray,    # [C_local, D]
    labels: jnp.ndarray,    # [B]
    seed: jnp.ndarray,      # [] int32 per-step sampling seed
    axis: str,
    n_sample: int,
    margin_logit_fn=None,
):
    """Per-shard CE over a sampled subset of class centers (PFC-0.1).

    The reference samples each shard's negatives independently
    (partial_fc.py:100-123: positives always kept, negatives drawn to fill
    `num_sample` slots); here the same policy runs with static shapes: sort
    class ids by (is-negative, random key) and keep the first `n_sample`.
    Gradients reach only the sampled rows (gather -> scatter-add under AD),
    so the optimizer touches the same sparse set the reference updates.
    """
    n_local = weight.shape[0]
    shard = jax.lax.axis_index(axis)
    lo = shard * n_local

    local_lab = labels - lo
    in_shard = (local_lab >= 0) & (local_lab < n_local)
    safe_lab = jnp.where(in_shard, local_lab, 0)

    # positives mask: classes of this shard present in the batch
    pos = jnp.zeros((n_local,), bool).at[safe_lab].set(in_shard)
    key = jax.random.fold_in(jax.random.key(seed), shard)
    rand = jax.random.uniform(key, (n_local,))
    # sort ascending by (negative?, random) -> positives first, then a
    # uniform draw of negatives; keep n_sample
    order = jnp.lexsort((rand, ~pos))
    idx = order[:n_sample]                                    # [K]
    sub_w = weight[idx]                                       # [K, D]

    # position of each local class inside the subset (C_local-valued = absent)
    pos_of = jnp.full((n_local,), n_local, jnp.int32).at[idx].set(
        jnp.arange(n_sample, dtype=jnp.int32)
    )
    tgt_pos = pos_of[safe_lab]
    in_sub = in_shard & (tgt_pos < n_sample)                  # == in_shard when
    # positives fit in n_sample (the reference asserts the same capacity)
    safe_pos = jnp.where(in_sub, tgt_pos, 0)

    logits = feats @ sub_w.T                                  # [B, K]
    if margin_logit_fn is not None:
        logits = margin_logit_fn(logits, safe_pos, in_sub)

    gmax = jax.lax.stop_gradient(
        jax.lax.pmax(jnp.max(jax.lax.stop_gradient(logits), axis=-1), axis)
    )
    z = jnp.exp(logits - gmax[:, None])
    denom = jax.lax.psum(jnp.sum(z, axis=-1), axis)
    tgt_logit = jnp.take_along_axis(logits, safe_pos[:, None], axis=-1)[:, 0]
    tgt = jax.lax.psum(jnp.where(in_sub, tgt_logit - gmax, 0.0), axis)
    return jnp.mean(jnp.log(denom) - tgt)


def sharded_sampled_softmax_ce(
    mesh: Mesh,
    feats: jnp.ndarray,
    weight: jnp.ndarray,      # [C, D] sharded over dim 0
    labels: jnp.ndarray,
    seed: jnp.ndarray,
    sample_rate: float = 0.1,
    axis: str = "model",
    margin_logit_fn=None,
) -> jnp.ndarray:
    """PartialFC with negative-class sampling (partial_fc.py `sample_rate`).

    `seed` is a scalar int32 that must change per step (the reference
    redraws its negative sample every forward)."""
    n_devices = mesh.shape[axis]
    n_local = weight.shape[0] // n_devices
    n_sample = max(1, int(round(n_local * sample_rate)))
    fn = shard_map(
        functools.partial(
            _local_sampled_ce, axis=axis, n_sample=n_sample,
            margin_logit_fn=margin_logit_fn,
        ),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P()),
        out_specs=P(),
    )
    return fn(feats, weight, labels, seed)


def cosface_margin(s: float = 64.0, m: float = 0.4):
    """CosFace margin head (arcface_torch/losses.py CombinedMarginLoss
    (1.0, 0.0, 0.4) configuration): logits are cosines; subtract m at the
    target class, scale by s."""

    def fn(logits, safe_local_labels, in_shard):
        onehot = jax.nn.one_hot(safe_local_labels, logits.shape[-1], dtype=logits.dtype)
        onehot = onehot * in_shard[:, None].astype(logits.dtype)
        return (logits - m * onehot) * s

    return fn


def arcface_margin(s: float = 64.0, m: float = 0.5):
    """ArcFace additive-angular margin (losses.py ArcFace): add m to the
    target-class angle before re-cosining."""

    def fn(logits, safe_local_labels, in_shard):
        onehot = jax.nn.one_hot(safe_local_labels, logits.shape[-1], dtype=bool)
        onehot = onehot & in_shard[:, None]
        theta = jnp.arccos(jnp.clip(logits, -1.0 + 1e-7, 1.0 - 1e-7))
        margined = jnp.cos(theta + m)
        return jnp.where(onehot, margined, logits) * s

    return fn
