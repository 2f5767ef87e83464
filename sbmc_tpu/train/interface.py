"""Training interface: compiled train/eval steps, optimizer, guards.

Mirrors the reference ``SampleBasedDenoiserInterface``
(sbmc/interfaces.py:35-132): Adam(lr=1e-4), TonemappedRelativeMSE training
loss, RelativeMSE as the reported metric, gradient-norm clipping at 1000 and
a fail-fast NaN/Inf loss guard — recast as a single ``jit``-compiled,
data-parallel train step (params replicated, batch sharded on the leading
axis; XLA inserts the gradient ``psum`` over ICI, with the splat backward
fused into the same compiled step per BASELINE.json).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sbmc_tpu import losses as losses_mod
from sbmc_tpu.utils.image import crop_like

__all__ = ["TrainState", "DenoiserInterface"]

LOSS_FNS = {
    "tonemapped_relative_mse": losses_mod.tonemapped_relative_mse,
    "relative_mse": losses_mod.relative_mse,
    "smape": losses_mod.smape,
    "tonemapped_mse": losses_mod.tonemapped_mse,
}


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class DenoiserInterface:
    """Builds and runs the compiled train/eval steps for a denoiser model.

    Args:
      model: a flax module whose ``apply(params, batch)`` returns a dict with
        "radiance".
      lr: Adam learning rate.
      loss: one of ``LOSS_FNS`` keys (default: the reference training loss).
      grad_clip: global-norm clip (reference: sbmc/interfaces.py:96).
      mesh: optional ``jax.sharding.Mesh`` for data-parallel training.
    """

    def __init__(self, model, lr=1e-4, loss="tonemapped_relative_mse",
                 grad_clip=1000.0, mesh=None):
        self.model = model
        self.loss_name = loss
        self.loss_fn = LOSS_FNS[loss]
        self.rmse_fn = losses_mod.relative_mse
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adam(lr),
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl)

    def init(self, rng, batch):
        params = self.model.init(rng, batch)
        opt_state = self.tx.init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from sbmc_tpu.parallel.mesh import replicate
            state = replicate(state, self.mesh)
        return state

    def _losses(self, params, batch):
        out = self.model.apply(params, batch)
        radiance = out["radiance"]
        tgt = crop_like(batch["target_image"], radiance)
        loss = self.loss_fn(radiance, tgt)
        rmse = self.rmse_fn(radiance, tgt)
        return loss, (rmse, self._input_baseline(batch, tgt))

    def _input_baseline(self, batch, tgt):
        """Training-sanity reference: the loss of the trivial predictor
        (the masked per-pixel sample mean — i.e. the noisy input itself)
        on the same batch. A healthy run drops below it within a few
        hundred steps; the 2026-08-19 bf16+reservoir run never did, and
        that took 9000 steps to notice without this column."""
        if "radiance" not in batch:        # kpcn batches
            return jnp.zeros(())
        rad = batch["radiance"].astype(jnp.float32)
        if "sample_mask" in batch:
            m = batch["sample_mask"].astype(jnp.float32)[
                :, :, None, None, None]
            mean = (rad * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        else:
            mean = rad.mean(1)
        return self.loss_fn(crop_like(mean, tgt), tgt)

    def _train_step_impl(self, state, batch):
        (loss, (rmse, base)), grads = jax.value_and_grad(
            self._losses, has_aux=True)(state.params, batch)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": loss, "rmse": rmse, "input_loss": base}

    def _eval_step_impl(self, params, batch):
        loss, (rmse, base) = self._losses(params, batch)
        return {"loss": loss, "rmse": rmse, "input_loss": base}

    @staticmethod
    def _arrays_only(batch):
        """Drop non-array metadata (e.g. file paths) before jit."""
        return {k: v for k, v in batch.items()
                if hasattr(v, "ndim") or np.isscalar(v)}

    def train_step(self, state, batch):
        """One optimization step. Returns (new_state, metrics dict of jax
        scalars — fetch lazily to keep the pipeline async)."""
        batch = self._arrays_only(batch)
        if self.mesh is not None:
            from sbmc_tpu.parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
        return self._train_step(state, batch)

    def eval_step(self, params, batch):
        batch = self._arrays_only(batch)
        if self.mesh is not None:
            from sbmc_tpu.parallel.mesh import shard_batch
            batch = shard_batch(batch, self.mesh)
        return self._eval_step(params, batch)

    @staticmethod
    def check_finite(metrics):
        """Fail fast on NaN/Inf loss (reference: sbmc/interfaces.py:88-94)."""
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            raise RuntimeError(
                "Loss is not finite (%r), there might be outliers in the "
                "data." % loss)
        return loss
