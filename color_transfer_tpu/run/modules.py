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

    def __init__(self, extraction_layers=18, transfer_layers=6, channels=64,
                 learning_rate=1e-4, heavy_metrics=True):
        self.model = DCMCS3DI(
            extraction_layers=extraction_layers,
            transfer_layers=transfer_layers,
            channels=channels,
        )
        self.learning_rate = learning_rate
        self.heavy_metrics = heavy_metrics
        self.hparams = {
            "extraction_layers": extraction_layers,
            "transfer_layers": transfer_layers,
            "channels": channels,
            "learning_rate": learning_rate,
        }

    def make_optimizer(self, num_train_steps=None):
        return optax.adam(self.learning_rate)

    def init_state(self, rng, sample_batch, num_train_steps=None):
        variables = self.model.init(
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

    @functools.partial(jax.jit, static_argnums=0)
    def eval_forward(self, params, batch):
        out, _ = self.model.apply(
            {"params": params}, batch["target"], batch["reference"], inference=True
        )
        return out

    def eval_metrics(self, out, gt):
        return quality_metrics(out, gt, "", True)


class ClassicalModule:
    """Runner equivalent for the classical methods
    (reference methods/__init__.py:10-40): evaluate an arbitrary registry
    method under the same metric harness — but vmapped on-device instead of
    a per-image CPU loop."""

    name = "classical"

    def __init__(self, func_spec="monge_kantorovitch"):
        self.func_spec = func_spec
        self.fn = methods.get_method(func_spec)
        self._batched = jax.jit(jax.vmap(self.fn))
        self.hparams = {"func_spec": func_spec}

    def eval_forward(self, params, batch):
        del params
        return jnp.clip(self._batched(batch["target"], batch["reference"]), 0.0, 1.0)

    def eval_metrics(self, out, gt):
        return quality_metrics(out, gt, "", True)


MODULE_REGISTRY = {
    "dcmcs3di": DCMCS3DIModule,
    "classical": ClassicalModule,
    # Reference class paths resolve to the equivalent modules.
    "methods.dcmcs3di.DCMCS3DI": DCMCS3DIModule,
    "methods.Runner": ClassicalModule,
}


def build_module(class_path, init_args=None):
    if class_path not in MODULE_REGISTRY:
        raise KeyError(
            f"unknown module {class_path!r}; known: {sorted(MODULE_REGISTRY)}"
        )
    return MODULE_REGISTRY[class_path](**(init_args or {}))
