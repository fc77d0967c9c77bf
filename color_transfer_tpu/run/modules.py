"""Method modules — the LightningModule equivalents.

Each module bundles a model/method with its optimizer, losses and metric
computation behind a uniform interface the trainer/evaluator drive:

    init_state(rng, sample_batch) -> TrainState
    train_step(state, batch, key) -> (state, metrics)   # one jitted program
    eval_forward(variables, batch) -> corrected image    # inference path
    eval_metrics(out, gt) -> dict                        # quality metrics

Batches are channel-last float32 dicts with keys 'gt', 'reference' and
(eval only) 'target'; during training the distorted target is synthesized
on-device inside the jitted step (reference does it in DataLoader workers,
utils/data.py:82).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from color_transfer_tpu import metrics as M
from color_transfer_tpu import methods
from color_transfer_tpu.data import distortions
from color_transfer_tpu.models.dcmcs3di import DCMCS3DI, compute_losses


def quality_metrics(out, gt, prefix="", heavy=True):
    """The reference's four quality metrics with its metric names
    (reference methods/dcmcs3di.py:87-90)."""
    vals = {
        f"{prefix}PSNR": M.psnr(out, gt),
        f"{prefix}SSIM": M.ssim(out, gt),
        f"{prefix}iCID": M.icid(out, gt),
    }
    if heavy:
        vals[f"{prefix}FSIM"] = M.fsim(out, gt)
    return vals


class DCMCS3DIModule:
    """Croci et al. corrector: Adam(1e-4), L1+MSE+SSIM + 0.005*PAM losses
    (reference methods/dcmcs3di.py:68-92,:146-147)."""

    name = "dcmcs3di"
    # Bucketed eval can pass a dynamic true-width for attention masking
    # (run/bucketing.py; models/dcmcs3di.py `valid_w`).
    supports_valid_w = True

    def __init__(self, extraction_layers=18, transfer_layers=6, channels=64,
                 learning_rate=1e-4, heavy_metrics=True,
                 fused_attention=True, attention_chunk=8,
                 compute_dtype=None, remat_convs=False):
        # compute_dtype ("bfloat16" opt-in; None = bit-strict f32): the
        # mixed-precision recipe for the conv stacks — params, matcher
        # statistics and losses stay float32 (models/dcmcs3di.py).
        # remat_convs trades one extra forward for O(1) activation memory
        # in the ResB stacks (large-crop/full-res training).
        self.model = DCMCS3DI(
            extraction_layers=extraction_layers,
            transfer_layers=transfer_layers,
            channels=channels,
            compute_dtype=(
                jnp.dtype(compute_dtype) if compute_dtype is not None else None
            ),
            remat_convs=remat_convs,
        )
        self.learning_rate = learning_rate
        self.heavy_metrics = heavy_metrics
        # Memory-bounded training matcher (ops/parallax_train.py): same loss
        # values/gradients, O(B*chunk*W^2) instead of O(B*H*W^2) attention
        # memory — enables crops/batches the reference cannot fit, and is
        # also 1.4x faster on v5e (348 vs 495 ms/step at the reference
        # recipe shape), so it is the default.
        self.fused_attention = fused_attention
        self.attention_chunk = attention_chunk
        self.hparams = {
            "extraction_layers": extraction_layers,
            "transfer_layers": transfer_layers,
            "channels": channels,
            "learning_rate": learning_rate,
            "fused_attention": fused_attention,
            "compute_dtype": compute_dtype,
            "remat_convs": remat_convs,
        }

    def make_optimizer(self, num_train_steps=None):
        return optax.adam(self.learning_rate)

    def init_state(self, rng, sample_batch, num_train_steps=None):
        # jit the init: eager Flax init dispatches every op separately,
        # which is pathologically slow under remote-compile TPU setups.
        variables = jax.jit(self.model.init)(
            rng, sample_batch["gt"], sample_batch["reference"]
        )
        return train_state.TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=self.make_optimizer(num_train_steps),
        )

    def synthesize_targets(self, batch, key):
        """Per-sample random distortion of the gt view, on-device."""
        keys = jax.random.split(key, batch["gt"].shape[0])
        target = jax.vmap(distortions.apply_uniform_distortions)(batch["gt"], keys)
        return {**batch, "target": target}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, key):
        batch = self.synthesize_targets(batch, key)

        def loss_fn(params):
            if self.fused_attention:
                from color_transfer_tpu.models.dcmcs3di import (
                    compute_losses_fused,
                )

                corrected, pam = state.apply_fn(
                    {"params": params},
                    batch["target"],
                    batch["reference"],
                    chunk=self.attention_chunk,
                    method=self.model.fused_train_forward,
                )
                total, parts = compute_losses_fused(corrected, pam, batch)
                return total, (corrected, parts)
            out = state.apply_fn(
                {"params": params}, batch["target"], batch["reference"]
            )
            total, parts = compute_losses(out, batch)
            return total, (out[0], parts)

        (total, (corrected, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)

        logs = {f"Training {k}": v for k, v in parts.items()}
        logs.update(
            quality_metrics(corrected, batch["gt"], "Training ", self.heavy_metrics)
        )
        logs["Training Total Loss"] = total
        return state, logs

    @functools.partial(jax.jit, static_argnums=0)
    def val_step(self, state, batch):
        """Validation mirrors the training step's losses+metrics on a
        precomputed target (reference methods/dcmcs3di.py:97-98)."""
        out = state.apply_fn(
            {"params": state.params}, batch["target"], batch["reference"]
        )
        total, parts = compute_losses(out, batch)
        logs = {k: v for k, v in parts.items()}
        logs.update(quality_metrics(out[0], batch["gt"], "", self.heavy_metrics))
        return logs

    def init_eval_variables(self, rng, sample_batch):
        """Fresh-init eval variables — `test` without a checkpoint must run
        from random init like the reference does, not crash."""
        variables = jax.jit(self.model.init)(
            rng, sample_batch["target"], sample_batch["reference"]
        )
        return variables["params"]

    @functools.partial(jax.jit, static_argnums=0)
    def eval_forward(self, params, batch):
        out, _ = self.model.apply(
            {"params": params}, batch["target"], batch["reference"], inference=True
        )
        return out

    def eval_metrics(self, out, gt):
        return quality_metrics(out, gt, "", True)

    def image_panels(self, state, batch):
        """Best-PSNR-gated qualitative panels (reference
        methods/dcmcs3di.py:116-144): chess mix, error maps, disparity,
        warped right view + occlusion mask. Takes the last batch item."""
        from color_transfer_tpu.models import pasm
        from color_transfer_tpu.utils import visualizations as viz

        one = {k: v[-1:] for k, v in batch.items()}
        result, (att, _, valid_mask, warped_right) = self.model.apply(
            {"params": state.params}, one["target"], one["reference"]
        )
        result = jnp.clip(result, 0, 1)
        disparity = pasm.regress_disp(att[0], valid_mask[0].astype(jnp.float32))
        disparity = jnp.broadcast_to(
            (disparity - disparity.min()) / (disparity.ptp() + 1e-9),
            one["gt"].shape[:-1] + (1,),
        )
        occlusion = 1.0 - valid_mask[0].astype(jnp.float32)
        return {
            "Left Ground Truth/Corrected": viz.chess_mix(one["gt"], result)[0],
            "RGB MSE Error": viz.rgbmse(one["gt"], result)[0],
            "RGB SSIM Error": viz.rgbssim(one["gt"], result)[0],
            "Disparity": jnp.repeat(disparity[0], 3, axis=-1),
            "Warped Right": warped_right[0],
            "Occlusions": jnp.repeat(occlusion[0], 3, axis=-1),
        }


class ClassicalModule:
    """Runner equivalent for the classical methods
    (reference methods/__init__.py:10-40): evaluate an arbitrary registry
    method under the same metric harness — but vmapped on-device instead of
    a per-image CPU loop."""

    name = "classical"

    def __init__(self, func_spec="monge_kantorovitch", seed=42):
        import inspect

        self.func_spec = func_spec
        self.seed = seed
        self.fn = methods.get_method(func_spec)
        # Stochastic methods (IDT/grading draw random SO(3) rotations,
        # reference methods/iterative.py:32) get a per-image key derived
        # from the config seed and a host-side call counter — matching the
        # reference's fresh-per-image global-RNG draws instead of one fixed
        # rotation set shared across every image of every batch.
        self._takes_key = "key" in inspect.signature(self.fn).parameters
        if self._takes_key:
            self._batched = jax.jit(
                jax.vmap(lambda t, r, k: self.fn(t, r, key=k))
            )
        else:
            self._batched = jax.jit(jax.vmap(self.fn))
        self._call_count = 0
        self.hparams = {"func_spec": func_spec}

    def init_state(self, rng, sample_batch, num_train_steps=None):
        """Classical methods are parameterless; the harness still drives
        them through the same state-passing interface."""
        del rng, sample_batch, num_train_steps
        return None

    def val_step(self, state, batch):
        """Metric-only validation (the reference Runner has no losses,
        methods/__init__.py:29-40)."""
        del state
        out = self.eval_forward(None, batch)
        return quality_metrics(out, batch["gt"], "", True)

    def eval_forward(self, params, batch):
        del params
        if self._takes_key:
            b = batch["target"].shape[0]
            base = jax.random.fold_in(
                jax.random.PRNGKey(self.seed), self._call_count
            )
            self._call_count += 1
            keys = jax.random.split(base, b)
            out = self._batched(batch["target"], batch["reference"], keys)
        else:
            out = self._batched(batch["target"], batch["reference"])
        return jnp.clip(out, 0.0, 1.0)

    def eval_metrics(self, out, gt):
        return quality_metrics(out, gt, "", True)


class BNTrainState(train_state.TrainState):
    """TrainState carrying BatchNorm statistics (DMSCT's encoder)."""

    batch_stats: dict = None


class DMSCTModule:
    """The reference authors' method: frozen GMFlow matcher + trainable
    EfficientNet/UNet corrector; AdamW(3e-4) with per-step cosine annealing
    to 1e-6 and MSE + 0.1*SSIM loss (reference methods/dmsct.py:118-131,
    :186-195). Matcher parameters are masked out of the optimizer — the JAX
    analogue of requires_grad=False (reference :31-32)."""

    name = "dmsct"

    def __init__(
        self,
        encoder_name="efficientnet-b2",
        encoder_depth=4,
        encoder_weights=None,
        decoder_channels=(256, 128, 64, 32),
        learning_rate=3e-4,
        eta_min=1e-6,
        weight_decay=0.01,
        heavy_metrics=True,
        matcher_checkpoint=None,
        matcher_num_layers=6,
        matcher_num_reg_refine=6,
        matcher_corr_dtype="float32",
        matcher_compute_dtype=None,
        corrector_compute_dtype=None,
        matcher_fused_attention="auto",
    ):
        from color_transfer_tpu.models.dmsct import DMSCT

        del encoder_weights  # reference configs pass null (untrained encoder)
        self.model = DMSCT(
            encoder_name=encoder_name,
            encoder_depth=encoder_depth,
            decoder_channels=tuple(decoder_channels),
            matcher_num_layers=matcher_num_layers,
            matcher_num_reg_refine=matcher_num_reg_refine,
            matcher_corr_dtype=matcher_corr_dtype,
            matcher_compute_dtype=matcher_compute_dtype,
            corrector_compute_dtype=corrector_compute_dtype,
            matcher_fused_attention=matcher_fused_attention,
        )
        self.learning_rate = learning_rate
        self.eta_min = eta_min
        self.weight_decay = weight_decay
        self.heavy_metrics = heavy_metrics
        self.matcher_checkpoint = matcher_checkpoint
        self.hparams = {
            "encoder_name": encoder_name,
            "encoder_depth": encoder_depth,
            "decoder_channels": list(decoder_channels),
            "learning_rate": learning_rate,
            "corrector_compute_dtype": corrector_compute_dtype,
            "matcher_fused_attention": matcher_fused_attention,
        }

    def make_optimizer(self, num_train_steps=None):
        steps = num_train_steps or 10_000
        schedule = optax.cosine_decay_schedule(
            self.learning_rate, steps, alpha=self.eta_min / self.learning_rate
        )
        adamw = optax.adamw(schedule, weight_decay=self.weight_decay)

        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "frozen"
                if path and getattr(path[0], "key", None) == "matcher"
                else "trainable",
                params,
            )

        return optax.multi_transform(
            {"trainable": adamw, "frozen": optax.set_to_zero()}, label
        )

    def init_state(self, rng, sample_batch, num_train_steps=None):
        p_rng, d_rng = jax.random.split(rng)
        variables = jax.jit(self.model.init)(
            {"params": p_rng, "dropout": d_rng},
            sample_batch["gt"],
            sample_batch["reference"],
        )
        params = variables["params"]
        if self.matcher_checkpoint is not None:
            from color_transfer_tpu.tools.convert_gmflow import load_matcher_params

            params = dict(params)
            params["matcher"] = load_matcher_params(
                self.matcher_checkpoint, params["matcher"]
            )
        return BNTrainState.create(
            apply_fn=self.model.apply,
            params=params,
            tx=self.make_optimizer(num_train_steps),
            batch_stats=variables.get("batch_stats", {}),
        )

    def synthesize_targets(self, batch, key):
        keys = jax.random.split(key, batch["gt"].shape[0])
        target = jax.vmap(distortions.apply_uniform_distortions)(batch["gt"], keys)
        return {**batch, "target": target}

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state, batch, key):
        from color_transfer_tpu.models.dmsct import compute_losses

        key, d_key = jax.random.split(key)
        batch = self.synthesize_targets(batch, key)

        def loss_fn(params):
            result, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["target"],
                batch["reference"],
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": d_key},
            )
            total, parts = compute_losses(result, batch["gt"])
            return total, (result, parts, updates)

        (total, (result, parts, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])

        logs = {f"Training {k}": v for k, v in parts.items()}
        logs.update(
            quality_metrics(result, batch["gt"], "Training ", self.heavy_metrics)
        )
        logs["Training Total Loss"] = total
        return state, logs

    @functools.partial(jax.jit, static_argnums=0)
    def val_step(self, state, batch):
        from color_transfer_tpu.models.dmsct import compute_losses

        result = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["target"],
            batch["reference"],
        )
        _, parts = compute_losses(result, batch["gt"])
        logs = dict(parts)
        logs.update(quality_metrics(result, batch["gt"], "", self.heavy_metrics))
        return logs

    def init_eval_variables(self, rng, sample_batch):
        p_rng, d_rng = jax.random.split(rng)
        variables = jax.jit(self.model.init)(
            {"params": p_rng, "dropout": d_rng},
            sample_batch["target"],
            sample_batch["reference"],
        )
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }

    @functools.partial(jax.jit, static_argnums=0)
    def eval_forward(self, variables, batch):
        return self.model.apply(variables, batch["target"], batch["reference"])

    def eval_metrics(self, out, gt):
        return quality_metrics(out, gt, "", True)

    def image_panels(self, state, batch):
        """Qualitative panels (reference methods/dmsct.py:148-184): chess
        mix, error maps, flow visualization, flow-warped reference +
        occlusion mask."""
        from color_transfer_tpu.core.sampling import flow_warp
        from color_transfer_tpu.utils import visualizations as viz
        from color_transfer_tpu.utils.flow_viz import flow_batch_to_images

        one = {k: v[-1:] for k, v in batch.items()}
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        result = self.model.apply(variables, one["target"], one["reference"])

        matcher_out = self.model.apply(
            variables,
            one["target"] * 255.0,
            one["reference"] * 255.0,
            method=lambda m, a, b: m.matcher(
                a, b, pred_bidir_flow=True, fwd_bwd_consistency_check=True
            ),
        )
        flow = matcher_out["flow"]
        flow_viz_img = (
            jnp.asarray(flow_batch_to_images(flow), dtype=jnp.float32) / 255.0
        )
        warped = jax.vmap(flow_warp)(one["reference"], flow)
        occ = jnp.repeat(matcher_out["fwd_occ"], 3, axis=-1)
        return {
            "Left Ground Truth/Corrected": viz.chess_mix(one["gt"], result)[0],
            "RGB MSE Error": viz.rgbmse(one["gt"], result)[0],
            "RGB SSIM Error": viz.rgbssim(one["gt"], result)[0],
            "Optical Flow": flow_viz_img[0],
            "Warped Right": warped[0],
            "Occlusions": occ[0],
        }


MODULE_REGISTRY = {
    "dcmcs3di": DCMCS3DIModule,
    "dmsct": DMSCTModule,
    "classical": ClassicalModule,
    # Reference class paths resolve to the equivalent modules.
    "methods.dcmcs3di.DCMCS3DI": DCMCS3DIModule,
    "methods.dmsct.DMSCT": DMSCTModule,
    "methods.Runner": ClassicalModule,
}


def build_module(class_path, init_args=None, seed=None):
    import inspect

    if class_path not in MODULE_REGISTRY:
        raise KeyError(
            f"unknown module {class_path!r}; known: {sorted(MODULE_REGISTRY)}"
        )
    cls = MODULE_REGISTRY[class_path]
    kwargs = dict(init_args or {})
    # Thread the config's seed_everything into modules that draw randomness
    # at eval time (ClassicalModule's IDT/grading rotations) unless the
    # config pins one explicitly.
    if (
        seed is not None
        and "seed" not in kwargs
        and "seed" in inspect.signature(cls.__init__).parameters
    ):
        kwargs["seed"] = seed
    return cls(**kwargs)
