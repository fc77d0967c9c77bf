"""Training / evaluation loops — the Trainer equivalent.

Drives a method module (run/modules.py) over a DataModule on a device mesh:
batches are sharded along the batch axis ('data'), parameters replicated, and
the jitted train step lets XLA insert the gradient/metric collectives over
ICI (the reference relies on Lightning DDP + sync_dist for the same thing,
reference methods/dcmcs3di.py:79-90).
"""

import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import jax.profiler

from color_transfer_tpu.data import distortions
from color_transfer_tpu.parallel import create_mesh, shard_batch, replicated_sharding
from color_transfer_tpu.run.checkpoint import CheckpointManager
from color_transfer_tpu.run.datamodule import to_float
from color_transfer_tpu.run.logging import MetricLogger, MeanAccumulator


class Trainer:
    def __init__(
        self,
        max_epochs=100,
        log_dir="runs/default",
        log_every=50,
        seed=42,
        monitor="Validation PSNR/dataloader_idx_0",
        use_wandb=False,
        val_every=1,
        mesh=None,
        profile_dir=None,
        profile_steps=(10, 15),
    ):
        self.max_epochs = max_epochs
        self.log_dir = Path(log_dir)
        self.log_every = log_every
        self.seed = seed
        self.val_every = val_every
        self.mesh = mesh if mesh is not None else create_mesh()
        self.logger = MetricLogger(self.log_dir, use_wandb=use_wandb)
        self.ckpt = CheckpointManager(self.log_dir / "checkpoints", monitor=monitor)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

    # -- helpers --

    def _device_batch(self, batch, sharded=True):
        batch = to_float(batch)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "distortion_idx"}
        if sharded and batch[next(iter(batch))].shape[0] % self.mesh.devices.size == 0:
            batch = shard_batch(batch, self.mesh)
        return batch

    # -- fit --

    def fit(self, module, datamodule, resume=None):
        rng = jax.random.PRNGKey(self.seed)

        train_loader = datamodule.train_loader()
        steps_per_epoch = len(train_loader)
        num_train_steps = steps_per_epoch * self.max_epochs

        sample = self._device_batch(train_loader.first_batch(), sharded=False)
        init_rng, rng = jax.random.split(rng)
        state = module.init_state(init_rng, sample, num_train_steps)

        start_epoch = 0
        if resume is not None:
            from color_transfer_tpu.run.checkpoint import load_checkpoint

            target = {"params": state.params, "opt_state": state.opt_state}
            if getattr(state, "batch_stats", None):
                target["batch_stats"] = state.batch_stats
            restored, meta = load_checkpoint(resume, target=target)
            replacements = {
                "params": restored["params"],
                "opt_state": restored["opt_state"],
                "step": int(meta.get("step") or 0),
            }
            if "batch_stats" in restored:
                replacements["batch_stats"] = restored["batch_stats"]
            state = state.replace(**replacements)
            # Epoch-accurate resume (Lightning --ckpt_path semantics,
            # reference README.md:69-70): continue from the saved epoch, not
            # epoch 0 — otherwise a resumed run trains up to 2x the budget.
            if meta.get("epoch") is not None:
                start_epoch = int(meta["epoch"]) + 1
            else:
                start_epoch = int(meta.get("step") or 0) // max(steps_per_epoch, 1)
            # Keep the shuffle/augmentation stream aligned with an
            # uninterrupted run (the shape probe above no longer consumes an
            # epoch, so epoch e iterates with loader epoch e in both runs).
            train_loader._epoch = start_epoch

        params_sharding = replicated_sharding(self.mesh)
        state = jax.device_put(state, params_sharding)

        step = int(state.step)
        max_scores = {}
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            last_batch = None
            last_logs = {}
            for batch in train_loader:
                batch = self._device_batch(batch)
                last_batch = batch
                key = jax.random.fold_in(rng, step)
                if self.profile_dir is not None and step == self.profile_steps[0]:
                    jax.profiler.start_trace(str(self.profile_dir))
                state, logs = module.train_step(state, batch, key)
                if self.profile_dir is not None and step == self.profile_steps[1]:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(), logs
                    )
                    jax.profiler.stop_trace()
                last_logs = logs
                if step % self.log_every == 0:
                    self.logger.log(
                        {k: float(v) for k, v in logs.items()}, step=step
                    )
                step += 1

            # Best-PSNR-gated qualitative panels (reference
            # methods/dcmcs3di.py:110-144, methods/dmsct.py:142-184).
            train_psnr = float(last_logs.get("Training PSNR", 0.0))
            if (
                hasattr(module, "image_panels")
                and last_batch is not None
                and train_psnr > max_scores.get("Training", 0.0)
            ):
                max_scores["Training"] = train_psnr
                try:
                    panel_batch = dict(last_batch)
                    if "target" not in panel_batch:
                        panel_batch = module.synthesize_targets(
                            panel_batch, jax.random.fold_in(rng, 2**31)
                        )
                    panels = module.image_panels(state, panel_batch)
                    self.logger.log_image(
                        "Training Images",
                        [np.asarray(v) for v in panels.values()],
                        caption=list(panels.keys()),
                        step=step,
                    )
                except Exception as e:  # noqa: BLE001 — viz must not kill a run
                    import traceback

                    (self.log_dir / "image_log_error.txt").write_text(
                        traceback.format_exc()
                    )
                    self.logger.log({"image_log_error": 1.0}, step=step)

            epoch_time = time.time() - t0
            self.logger.log({"epoch": epoch, "epoch_time": epoch_time}, step=step)

            if (epoch + 1) % self.val_every == 0:
                val_metrics = self.validate(module, datamodule, state, step)
                self._log_val_panels(
                    module, datamodule, state, val_metrics, max_scores, step
                )
                payload = {"params": state.params, "opt_state": state.opt_state}
                if getattr(state, "batch_stats", None):
                    payload["batch_stats"] = state.batch_stats
                self.ckpt.save_last(
                    payload, hparams=module.hparams, step=step, epoch=epoch
                )
                self.logger.log_checkpoint(
                    self.ckpt.ckpt_dir / "last", "last", step=step
                )
                if self.ckpt.monitor in val_metrics:
                    if self.ckpt.save_best(
                        payload, val_metrics, hparams=module.hparams, step=step,
                        epoch=epoch,
                    ):
                        self.logger.log_checkpoint(
                            self.ckpt.ckpt_dir / "best", "best", step=step,
                            score=float(val_metrics[self.ckpt.monitor]),
                        )
        return state

    def _log_val_panels(self, module, datamodule, state, val_metrics,
                        max_scores, step):
        """Best-PSNR-gated image panels per validation split (the reference
        keeps a per-prefix ``max_scores`` dict and logs panels for Training
        AND both validation dataloaders, methods/dcmcs3di.py:110-144)."""
        if not hasattr(module, "image_panels"):
            return
        rng = jax.random.PRNGKey(self.seed + 2)
        for idx, loader in enumerate(datamodule.val_loaders()):
            split = f"Validation/dataloader_idx_{idx}"
            psnr = val_metrics.get(f"Validation PSNR/dataloader_idx_{idx}")
            if psnr is None or psnr <= max_scores.get(split, 0.0):
                continue
            max_scores[split] = psnr
            try:
                batch = self._device_batch(loader.first_batch(), sharded=False)
                if "target" not in batch:
                    batch = module.synthesize_targets(
                        batch, jax.random.fold_in(rng, idx)
                    )
                panels = module.image_panels(state, batch)
                self.logger.log_image(
                    f"Validation Images/dataloader_idx_{idx}",
                    [np.asarray(v) for v in panels.values()],
                    caption=list(panels.keys()),
                    step=step,
                )
            except Exception:  # noqa: BLE001 — viz must not kill a run
                import traceback

                (self.log_dir / "image_log_error.txt").write_text(
                    traceback.format_exc()
                )
                self.logger.log({"image_log_error": 1.0}, step=step)

    # -- validation --

    def validate(self, module, datamodule, state, step, max_batches=None):
        rng = jax.random.PRNGKey(self.seed + 1)
        all_metrics = {}
        for idx, loader in enumerate(datamodule.val_loaders()):
            acc = MeanAccumulator()
            for b_i, batch in enumerate(loader):
                if max_batches is not None and b_i >= max_batches:
                    break
                batch = self._device_batch(batch, sharded=False)
                if "target" not in batch:
                    # Artificial val set: synthesize the distorted target
                    # on-device (the reference does it in the Dataset,
                    # utils/data.py:82).
                    keys = jax.random.split(
                        jax.random.fold_in(rng, b_i), batch["gt"].shape[0]
                    )
                    target = jax.vmap(distortions.apply_uniform_distortions)(
                        batch["gt"], keys
                    )
                    batch = {**batch, "target": target}
                logs = module.val_step(state, batch)
                acc.update({k: float(v) for k, v in logs.items()})
            means = acc.means()
            all_metrics.update(
                {f"Validation {k}/dataloader_idx_{idx}": v for k, v in means.items()}
            )
        if all_metrics:
            self.logger.log(all_metrics, step=step)
        return all_metrics

    # -- test --

    def test(self, module, datamodule, params=None, max_batches=None,
             eval_buckets=None):
        """Full eval sweep: artificial grid + real-world, PSNR/SSIM/FSIM/iCID
        (the reference's `test` subcommand, methods/__init__.py:29-40).

        ``eval_buckets``: pad-to-multiple bucket size (e.g. 64) — mixed-shape
        sweeps then compile O(buckets) times instead of O(distinct shapes)
        (run/bucketing.py; SURVEY.md §7 hard part #5). None = native shapes.
        """
        grid = distortions.setup_grid_distortions()
        if params is None and hasattr(module, "init_eval_variables"):
            # `test` without --ckpt_path on a deep module runs from random
            # init (the reference does; Lightning restores nothing either).
            sample = None
            for loader in datamodule.test_loaders():
                sample = self._device_batch(
                    {k: v for k, v in loader.first_batch().items()
                     if k != "distortion_idx"},
                    sharded=False,
                )
                break
            if sample is not None:
                if "target" not in sample:
                    sample = {**sample, "target": sample["gt"]}
                params = module.init_eval_variables(
                    jax.random.PRNGKey(self.seed), sample
                )
        bucketed = None
        if eval_buckets:
            if not getattr(module, "supports_valid_w", False):
                # Classical global-statistics methods compute means /
                # covariances / histograms over the whole image: zero
                # padding shifts every statistic toward black and corrupts
                # the output inside the true region. Only modules that can
                # mask the padded width (DCMCS3DI) may run bucketed.
                import warnings

                warnings.warn(
                    f"--eval_buckets ignored: module '{module.name}' cannot "
                    "mask padded pixels; evaluating at native shapes",
                    stacklevel=2,
                )
            else:
                from color_transfer_tpu.run.bucketing import BucketedEvaluator

                bucketed = BucketedEvaluator(module, multiple=eval_buckets)
        results = {}
        for idx, loader in enumerate(datamodule.test_loaders()):
            acc = MeanAccumulator()
            for b_i, batch in enumerate(loader):
                if max_batches is not None and b_i >= max_batches:
                    break
                dist_idx = batch.pop("distortion_idx", None)
                batch = self._device_batch(batch, sharded=False)
                if "target" not in batch:
                    # Artificial test: apply each item's grid distortion
                    # (batch-safe — items may carry different indices).
                    idxs = np.atleast_1d(np.asarray(dist_idx)).tolist()
                    target = jnp.stack(
                        [grid[int(d)](batch["gt"][j]) for j, d in enumerate(idxs)]
                    )
                    batch = {**batch, "target": target}
                if bucketed is not None:
                    _, logs = bucketed.eval_batch(params, batch)
                else:
                    out = module.eval_forward(params, batch)
                    logs = module.eval_metrics(out, batch["gt"])
                acc.update({k: float(v) for k, v in logs.items()})
            means = acc.means()
            results.update(
                {f"Test {k}/dataloader_idx_{idx}": v for k, v in means.items()}
            )
        self.logger.log(results, step=0)
        return results
