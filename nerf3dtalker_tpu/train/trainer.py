"""Epoch-level training driver.

Equivalent of reference `Trainer` (talker_trainer.py:568-1241): epoch loop
over the frame dataset, per-epoch validation computing SSIM/PSNR (LPIPS
when alex weights are provided), metric-stamped orbax checkpoints
(talker_trainer.py:920-937 embeds SSIM/PSNR/LPIPS in filenames — we stamp
them into the checkpoint metadata), and resume.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.data.dataset import FrameDataset
from nerf3dtalker_tpu.train.step import TrainState, build_step_fns
from nerf3dtalker_tpu.utils import checkpoints as ckpt
from nerf3dtalker_tpu.utils.metrics import psnr, ssim_rgb

log = logging.getLogger("nerf3dtalker_tpu")


class Trainer:
    def __init__(
        self,
        nerf_cfg: NeRFConfig,
        train_cfg: TrainConfig,
        train_data: FrameDataset,
        val_data: Optional[FrameDataset] = None,
        vgg_params=None,
        mesh=None,
        lpips: Optional[tuple] = None,   # (alexnet params, lin weights)
        train_eval_data: Optional[FrameDataset] = None,
    ):
        self.nerf_cfg = nerf_cfg
        self.train_cfg = train_cfg
        self.train_data = train_data
        self.val_data = val_data
        # optional train-split eval set: per-validation TRAIN_PSNR/SSIM
        # rows alongside the val metrics (the reference logs train-side
        # image metrics the same way, talker_trainer.py:1087-1150)
        self.train_eval_data = train_eval_data
        # effective frame batch: clamp to the dataset (a 1-frame subject
        # must still train under the B=2 default) and warn once about
        # drop_last remainders
        self.batch_size = max(1, min(train_cfg.batch_size, len(train_data)))
        if self.batch_size != train_cfg.batch_size:
            log.warning(
                "batch_size %d > dataset size %d; training with B=%d",
                train_cfg.batch_size, len(train_data), self.batch_size,
            )
        rem = len(train_data) % self.batch_size
        if rem:
            log.warning(
                "dataset size %d not divisible by batch %d: %d frame(s) "
                "dropped from each epoch (drop_last)",
                len(train_data), self.batch_size, rem,
            )
        if vgg_params is None and train_cfg.use_vgg_loss:
            # honor TrainConfig.use_vgg_loss: the reference applies the
            # VGG perceptual term on every training step
            # (HeadNeRFLossUtils.py:196-236); converted torchvision
            # weights when available, deterministic random features else
            from nerf3dtalker_tpu.models.perceptual import load_vgg16

            vgg_params = load_vgg16(train_cfg.vgg_weights, seed=0)
            log.info(
                "VGG perceptual loss on (%s weights)",
                "converted" if train_cfg.vgg_weights else "random-feature",
            )
        precomputed_vgg = False
        if vgg_params is not None and train_cfg.vgg_precompute_gt:
            import jax
            import jax.numpy as jnp

            vgg_cdt = jnp.bfloat16 if train_cfg.bf16_compute else None
            bg = 1.0 if nerf_cfg.bg_type == "white" else 0.0
            # fingerprint the (weights, bg, dtype) the activations were
            # computed with — stale caches from other weights are recomputed
            leaf = jax.tree_util.tree_leaves(vgg_params)[0]
            fp = (float(jnp.sum(jnp.abs(leaf))), bg, str(vgg_cdt))
            for ds in (train_data, val_data, train_eval_data):
                if ds is None:
                    continue
                if getattr(ds, "vgg_fingerprint", None) != fp:
                    ds.precompute_gt_vgg(
                        vgg_params, bg_value=bg, compute_dtype=vgg_cdt
                    )
                    ds.vgg_fingerprint = fp
            precomputed_vgg = True
        steps_per_epoch = max(1, len(train_data) // self.batch_size)
        self.fns = build_step_fns(
            nerf_cfg, train_cfg, steps_per_epoch=steps_per_epoch,
            vgg_params=vgg_params, mesh=mesh,
            precomputed_vgg=precomputed_vgg,
        )
        self._precomputed_vgg = precomputed_vgg
        self._cached_step_fn = None
        self.mesh = mesh
        self.lpips = lpips
        self.state: Optional[TrainState] = None
        self.history: list = []
        self.start_epoch = 0
        self._steps_per_epoch = steps_per_epoch
        # failure-recovery policy over the device-side finite_step counter
        # (reference analog: isnan warning talker_trainer.py:1071-1073 +
        # manual checkpoint recovery :1167-1201)
        from nerf3dtalker_tpu.utils.guards import StepGuard

        self.guard = StepGuard(
            max_bad=train_cfg.guard_max_bad, policy=train_cfg.guard_policy
        )
        self._trace_pending = bool(train_cfg.trace_dir)
        # device-resident dataset cache: batches gather on-device, the
        # per-step host->device traffic is just frame indices (the
        # minimise-host-transfers rule; a Reso64 B=2 batch with VGG planes
        # is ~126 MB of upload otherwise). Takes precedence over the
        # native prefetcher (whose host-side role it obsoletes); datasets
        # above the HBM budget fall back to the host loaders below.
        self._use_device_cache = False
        if (
            train_cfg.device_cache
            and mesh is None
            and train_data.nbytes() <= train_cfg.device_cache_bytes
        ):
            train_data.to_device(self.batch_size)
            self._use_device_cache = True
            log.info(
                "device-resident dataset cache on (%.1f MB)",
                train_data.nbytes() / 1e6,
            )
        self._prefetcher = None
        if train_cfg.native_prefetch and not self._use_device_cache:
            try:
                from nerf3dtalker_tpu.data.native import FramePrefetcher

                self._prefetcher = FramePrefetcher(
                    train_data, self.batch_size, seed=train_cfg.seed
                )
                log.info("native C++ batch prefetcher enabled")
            except (ImportError, OSError) as e:   # build failed OR bad .so
                log.warning("native prefetcher unavailable (%s); "
                            "falling back to the Python loader", e)

    def _cached_epoch(self, n_steps: int, n_epochs: int = 1):
        """`n_epochs` WHOLE epochs as one compiled program: an outer
        lax.scan over epochs, an inner scan over steps, each iteration
        gathering its batch from the HBM-resident cache, deriving its rng
        key, and applying the train step; per-epoch losses accumulate in
        the scans. Per-step overheads (program launch, dispatch, host
        round trips) disappear entirely — the host touches the device
        once per GROUP of epochs.

        Measured (2026-08-21, tunneled v5e): the step CONTENT above the
        grad computation is ~1.2 ms (Audio2Style fused-BiLSTM fwd+bwd
        0.16 ms + two-group Adam 0.85 ms + guard 0.16 ms,
        scripts/profile_tail.py); the 12-25 ms/step "tail" r4 observed
        was the ~200 ms per-program host round trip over the tunnel
        divided by steps-per-epoch. Grouping epochs divides it by
        steps-per-group instead."""
        key = (n_steps, n_epochs)
        fn = self._cached_step_fn.get(key) if self._cached_step_fn else None
        if fn is None:
            import jax.numpy as jnp

            from nerf3dtalker_tpu.data.dataset import BATCH_FIELDS

            inner = self.fns.train_step_aot
            with_vgg = self._precomputed_vgg
            bs = self.batch_size

            def epoch_group_fn(state, cache, xy_b, orders, seed_bases):
                # orders [E, n_steps*bs] int32; seed_bases [E] uint32
                def one_epoch(st, ep):
                    order, seed_base = ep

                    def body(st, i):
                        idx = jax.lax.dynamic_slice(order, (i * bs,), (bs,))
                        b = {
                            out: jnp.take(cache[src], idx, 0)
                            for out, src in BATCH_FIELDS if src in cache
                        }
                        if with_vgg:
                            for j in range(4):
                                b[f"vgg_f{j}"] = jnp.take(
                                    cache[f"vgg_f{j}"], idx, 0
                                )
                        b["xy"] = xy_b
                        st, losses = inner(
                            st, b,
                            jax.random.key(seed_base + i.astype(jnp.uint32)),
                        )
                        return st, losses

                    st, losses_seq = jax.lax.scan(
                        body, st, jnp.arange(n_steps)
                    )
                    return st, jax.tree.map(
                        lambda x: jnp.sum(x, axis=0), losses_seq
                    )

                state, totals = jax.lax.scan(
                    one_epoch, state, (orders, seed_bases)
                )
                return state, totals   # each total leaf: [E]

            fn = jax.jit(epoch_group_fn)
            if self._cached_step_fn is None:
                self._cached_step_fn = {}
            self._cached_step_fn[key] = fn
        return fn

    # ------------------------------------------------------------- lifecycle

    def init(self, seed: Optional[int] = None) -> None:
        seed = self.train_cfg.seed if seed is None else seed
        batch = self.train_data.batch(np.arange(self.batch_size))
        self.state = self.fns.init(jax.random.key(seed), batch)

    def resume(self, path: str) -> int:
        assert self.state is not None, "call init() first (supplies structure)"
        self.state, meta = ckpt.restore_checkpoint(path, self.state)
        step = int(meta.get("step", 0))
        self.start_epoch = step // max(self._steps_per_epoch, 1)
        return step

    def save(self, metrics: Optional[Dict] = None) -> None:
        if not self.train_cfg.ckpt_dir:
            return
        import dataclasses

        os.makedirs(self.train_cfg.ckpt_dir, exist_ok=True)
        # checkpoints are self-describing: the full NeRF+Train config rides
        # in the checkpoint metadata so from_checkpoint() can rebuild the
        # model+optimizer from the path alone — the reference's `para`
        # block (talker_trainer.py:915-918, consumed at train.py:18-22)
        ckpt.save_checkpoint(
            self.train_cfg.ckpt_dir,
            self.state,
            config={
                "nerf": dataclasses.asdict(self.nerf_cfg),
                "train": dataclasses.asdict(self.train_cfg),
            },
            step=int(self.state.step),
            metrics=metrics or {},
        )

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        train_data: FrameDataset,
        val_data: Optional[FrameDataset] = None,
        mesh=None,
        lpips: Optional[tuple] = None,
        reuse_from: Optional["Trainer"] = None,
        train_eval_data: Optional[FrameDataset] = None,
        **cfg_overrides,
    ) -> "Trainer":
        """Rebuild a Trainer (model + optimizer + state) from a checkpoint
        directory alone — no external config needed (the reference
        restores `para` from the checkpoint the same way, train.py:18-22).

        ``cfg_overrides`` are applied on top of the stored TrainConfig
        (e.g. ``epochs=60`` to extend a run).

        ``reuse_from``: an earlier Trainer in the SAME process whose
        compiled step/epoch programs should be adopted when the model
        config matches. Without it, a same-process resume re-traces the
        jitted step and whole-epoch scan and pays a fresh XLA compile —
        the persistent compile cache does not cover the axon
        remote-compile tunnel, so at short run lengths that recompile
        (~5 min at Reso64) doubles wall time (TRAIN_r04 epochs 0/10)."""
        import dataclasses

        meta = ckpt.load_meta(path)
        cfgd = meta.get("config", {})
        if "nerf" not in cfgd:
            raise ValueError(
                f"checkpoint at {path} has no embedded config; "
                "pass configs and use resume() instead"
            )

        def build(cls_, d):
            fields = {f.name for f in dataclasses.fields(cls_)}
            return cls_(**{k: v for k, v in d.items() if k in fields})

        nerf_cfg = build(NeRFConfig, cfgd["nerf"])
        # future saves and StepGuard rollbacks must target the directory
        # the user resumed FROM, not wherever the original run saved to
        # (checkpoints may have been moved/copied since)
        cfg_overrides.setdefault("ckpt_dir", path)
        train_cfg = build(
            TrainConfig, {**cfgd.get("train", {}), **cfg_overrides}
        )
        t = cls(nerf_cfg, train_cfg, train_data, val_data, mesh=mesh,
                lpips=lpips, train_eval_data=train_eval_data)
        if reuse_from is not None:
            compiled_fields = (
                "batch_size", "lr", "lr_audio", "step_lr_every",
                "step_lr_gamma", "use_vgg_loss", "vgg_weights",
                "vgg_precompute_gt", "bf16_compute",
            )
            same_model = (
                reuse_from.nerf_cfg == nerf_cfg
                and reuse_from.batch_size == t.batch_size
                and reuse_from._steps_per_epoch == t._steps_per_epoch
                and reuse_from._precomputed_vgg == t._precomputed_vgg
                and reuse_from.mesh is t.mesh
                and all(
                    getattr(reuse_from.train_cfg, f) == getattr(train_cfg, f)
                    for f in compiled_fields
                )
            )
            if same_model:
                t.fns = reuse_from.fns
                t._cached_step_fn = reuse_from._cached_step_fn
                log.info("from_checkpoint: reusing compiled programs")
            else:
                log.warning(
                    "from_checkpoint: reuse_from config mismatch; "
                    "recompiling"
                )
        t.init()
        t.resume(path)
        return t

    # ------------------------------------------------------------- training

    def train_epoch_group(self, start_epoch: int, n_epochs: int) -> list:
        """Run `n_epochs` consecutive epochs as ONE device program
        (device-cache path only) — one host round trip per group. Returns
        one averaged-metrics dict per epoch. Epoch semantics (shuffle
        order, per-step rng keys) are IDENTICAL to per-epoch calls."""
        import jax.numpy as jnp

        assert self._use_device_cache, "device cache required"
        bs = self.batch_size
        n = len(self.train_data) // bs
        t0 = time.time()
        orders, seeds = [], []
        for e in range(start_epoch, start_epoch + n_epochs):
            rng = np.random.default_rng(self.train_cfg.seed + e)
            order = np.arange(len(self.train_data))
            rng.shuffle(order)
            orders.append(order[: n * bs].astype(np.int32))
            seeds.append(np.uint32(
                ((self.train_cfg.seed + e) * 100003) & 0xFFFFFFFF
            ))
        self.state, totals = self._cached_epoch(n, n_epochs)(
            self.state, self.train_data._dev, self.train_data._dev_xy,
            jnp.asarray(np.stack(orders)), jnp.asarray(np.stack(seeds)),
        )
        jax.block_until_ready(totals)
        sec_per_step = (time.time() - t0) / max(n * n_epochs, 1)
        out = []
        for i in range(n_epochs):
            avg = {
                k: float(v[i]) / max(n, 1) for k, v in totals.items()
            }
            avg["sec_per_step"] = sec_per_step
            avg["rays_per_s"] = (
                bs * self.nerf_cfg.n_rays / max(sec_per_step, 1e-9)
            )
            out.append(avg)
        self._last_epoch_steps = n
        return out

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        rng = np.random.default_rng(self.train_cfg.seed + epoch)
        # losses accumulate ON DEVICE and materialize once per epoch:
        # a per-step float(v) is a device->host sync that serializes the
        # step stream (the reference's tqdm-loss pattern,
        # talker_trainer.py:1075-1079, is exactly this bug at GPU speeds)
        totals: Optional[Dict] = None
        n = 0
        t0 = time.time()
        if self._use_device_cache and not self._trace_pending:
            return self.train_epoch_group(epoch, 1)[0]
        if self._use_device_cache:
            bs = self.batch_size
            order = np.arange(len(self.train_data))
            rng.shuffle(order)
            end = len(order) - (len(order) % bs)
            batches = (
                self.train_data.device_batch(order[i : i + bs])
                for i in range(0, end, bs)
            )
        elif self._prefetcher is not None:
            batches = (
                self._prefetcher.next()
                for _ in range(self._prefetcher.steps_per_epoch)
            )
        else:
            batches = self.train_data.epoch(self.batch_size, rng)
        tracing = False
        for i, batch in enumerate(batches):
            # same 32-bit wrap as the device-cache epoch program's
            # seed_base (uint32 arithmetic there) so both input paths
            # derive identical per-step keys for any seed
            seed = np.uint32(
                ((self.train_cfg.seed + epoch) * 100003 + i) & 0xFFFFFFFF
            )
            if self.mesh is not None:
                from nerf3dtalker_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            self.state, losses = self.fns.train_step(
                self.state, batch, jax.random.key(seed)
            )
            if self._trace_pending:
                # profile steps 1..trace_steps of the first epoch (step 0
                # is compile; block so the capture holds only steady-state
                # device work) — utils/observability.trace region
                from nerf3dtalker_tpu.utils import observability as obs

                if i == 0:
                    jax.block_until_ready(losses)
                    obs.start_trace(self.train_cfg.trace_dir)
                    tracing = True
                elif tracing and i >= self.train_cfg.trace_steps:
                    jax.block_until_ready(losses)
                    obs.stop_trace()
                    tracing = False
                    self._trace_pending = False
                    log.info("profiler trace written to %s",
                             self.train_cfg.trace_dir)
            totals = (
                losses if totals is None
                else jax.tree.map(jax.numpy.add, totals, losses)
            )
            n += 1
        if tracing:   # epoch shorter than trace_steps
            jax.block_until_ready(totals)
            from nerf3dtalker_tpu.utils import observability as obs

            obs.stop_trace()
            self._trace_pending = False
        avg = (
            {k: float(v) / max(n, 1) for k, v in totals.items()}
            if totals else {}
        )
        avg["sec_per_step"] = (time.time() - t0) / max(n, 1)
        # rays/s throughput (the bench.py metric) from the epoch wall time
        avg["rays_per_s"] = (
            self.batch_size * self.nerf_cfg.n_rays
            / max(avg["sec_per_step"], 1e-9)
        )
        self._last_epoch_steps = n
        return avg

    def validate(self, dump_dir: Optional[str] = None, epoch: int = 0) -> Dict[str, float]:
        out = self._eval_split(self.val_data, dump_dir=dump_dir, epoch=epoch)
        if self.train_eval_data is not None:
            tr = self._eval_split(self.train_eval_data)
            out.update({f"TRAIN_{k}": v for k, v in tr.items()})
        return out

    def _eval_split(
        self, data: Optional[FrameDataset],
        dump_dir: Optional[str] = None, epoch: int = 0,
    ) -> Dict[str, float]:
        if data is None:
            return {}
        # under a mesh the eval step's batch shardings need B divisible by
        # the data axis — validate in data-axis-sized batches there
        bs = 1
        if self.mesh is not None:
            bs = int(self.mesh.shape.get("data", 1))
        ssims, psnrs, lpipss = [], [], []
        n_seen = 0
        for batch in data.epoch(
            bs, rng=None, drop_last=(bs > 1)
        ):
            ebatch = batch
            if self.mesh is not None:
                from nerf3dtalker_tpu.parallel.mesh import shard_batch

                ebatch = shard_batch(batch, self.mesh)
            imgs, _ = self.fns.eval_step(self.state.params, ebatch)
            imgs = np.asarray(imgs)
            for j in range(imgs.shape[0]):
                pred = imgs[j]
                gt = batch["gt_rgb"][j]
                ssims.append(float(ssim_rgb(pred, gt)))
                psnrs.append(float(psnr(pred, gt)))
                if self.lpips is not None:
                    # LPIPS-alex, matching Eval_utils.py:108-115 (supply
                    # converted weights via convert_lpips_alex)
                    from nerf3dtalker_tpu.utils.metrics import lpips_alex

                    lp_params, lp_lins = self.lpips
                    lpipss.append(float(
                        lpips_alex(lp_params, lp_lins, pred[None], gt[None])[0]
                    ))
                if dump_dir:
                    # side-by-side GT|render dumps per val iter, viewable
                    # (talker_trainer.py:1203-1216 temp_image behaviour)
                    from nerf3dtalker_tpu.models.misc import draw_side_by_side
                    from nerf3dtalker_tpu.utils.video import write_png

                    d = os.path.join(dump_dir, f"epoch{epoch}")
                    os.makedirs(d, exist_ok=True)
                    write_png(
                        os.path.join(d, f"val_{n_seen:04d}.png"),
                        draw_side_by_side(gt, pred),
                    )
                n_seen += 1
        if bs > 1:
            skipped = len(data) - n_seen
            if skipped:
                log.warning(
                    "validate: %d val frame(s) skipped (val set not "
                    "divisible by the mesh data axis %d)", skipped, bs,
                )
        if not ssims:
            return {}
        out = {"SSIM": float(np.mean(ssims)), "PSNR": float(np.mean(psnrs))}
        if lpipss:
            out["LPIPS"] = float(np.mean(lpipss))
        return out

    def train(self, epochs: Optional[int] = None) -> list:
        if self.state is None:
            self.init()
        epochs = epochs or self.train_cfg.epochs
        dump_dir = (
            os.path.join(self.train_cfg.log_dir, "temp_image")
            if self.train_cfg.log_dir else None
        )
        # per-epoch JSONL (+optional TB) metric stream from the
        # device-side accumulated losses — the reference's SummaryWriter
        # surface (talker_trainer.py:623, train_vq.py:108)
        mlog = None
        if self.train_cfg.log_dir and self.train_cfg.metric_log:
            from nerf3dtalker_tpu.utils.observability import MetricLogger

            mlog = MetricLogger(
                self.train_cfg.log_dir,
                use_tensorboard=self.train_cfg.use_tensorboard,
            )
        ve = max(self.train_cfg.val_every, 1)
        try:
            epoch = self.start_epoch
            while epoch < epochs:
                # device-cached path: run all epochs up to the next
                # validation point as ONE device program — one host round
                # trip per group (the tunnel round trip is otherwise the
                # dominant per-step cost at small steps-per-epoch; see
                # _cached_epoch docstring). Checkpoint/validation cadence
                # is val_every; intermediate epoch states don't
                # materialize on the host.
                if self._use_device_cache and not self._trace_pending:
                    group = min(epochs - epoch, ve - (epoch % ve))
                    metrics_list = self.train_epoch_group(epoch, group)
                else:
                    metrics_list = [self.train_one_epoch(epoch)]
                rolled_back = False
                for j, train_metrics in enumerate(metrics_list):
                    e = epoch + j
                    # StepGuard consumes the jitted step's finite_step
                    # counter once per epoch (no per-step host sync) and
                    # may roll the state back to the last good checkpoint
                    n = self._last_epoch_steps
                    n_bad = int(round(
                        n * (1.0 - train_metrics.get("finite_step", 1.0))
                    ))
                    action = self.guard.epoch_check(n_bad, n, e)
                    if action == "rollback":
                        if self.train_cfg.ckpt_dir and ckpt.has_checkpoint(
                            self.train_cfg.ckpt_dir
                        ):
                            step = self.resume(self.train_cfg.ckpt_dir)
                            log.warning(
                                "StepGuard: rolled back to checkpoint step "
                                "%d after %d non-finite step(s) in epoch %d",
                                step, n_bad, e,
                            )
                        else:
                            log.warning(
                                "StepGuard: rollback requested but no "
                                "checkpoint exists yet; continuing with "
                                "guarded params"
                            )
                        rec = {"epoch": e, **train_metrics, "rollback": 1.0}
                        self.history.append(rec)
                        if mlog is not None:
                            mlog.log(int(self.state.step), rec)
                        rolled_back = True
                        epoch = e + 1
                        break   # don't validate/checkpoint the bad group
                    do_val = (
                        (e + 1) % ve == 0 or e == epochs - 1
                    ) and j == len(metrics_list) - 1
                    val_metrics = (
                        self.validate(dump_dir=dump_dir, epoch=e)
                        if do_val else {}
                    )
                    rec = {"epoch": e, **train_metrics, **val_metrics}
                    self.history.append(rec)
                    log.info("epoch %d: %s", e, rec)
                    if mlog is not None:
                        # per-epoch step index within a grouped run
                        step_e = int(self.state.step) - n * (
                            len(metrics_list) - 1 - j
                        )
                        mlog.log(
                            step_e,
                            {k: v for k, v in rec.items() if k != "epoch"},
                        )
                    if do_val:
                        self.save(metrics=val_metrics)
                if not rolled_back:
                    epoch += len(metrics_list)
        finally:
            if mlog is not None:
                mlog.close()
        return self.history
