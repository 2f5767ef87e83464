"""Generic training loop (the ttools.Trainer role, reference:
scripts/train.py:96-114)."""

import numpy as np

from sbmc_tpu.utils.logging import get_logger

LOG = get_logger(__name__)

__all__ = ["Trainer"]


class Trainer:
    """Drives epochs of train steps with callbacks and validation.

    The NaN/Inf loss guard is checked with one step of lag so the metric
    fetch overlaps the next step's execution (async dispatch) instead of
    serializing host and device.
    """

    def __init__(self, interface, callbacks=()):
        self.interface = interface
        self.callbacks = list(callbacks)
        self.state = None

    def _emit(self, name, *args):
        for cb in self.callbacks:
            getattr(cb, name)(*args)

    def train(self, state, dataloader, num_epochs=None, val_dataloader=None,
              max_steps=None):
        """Run training; returns the final state."""
        self.state = state
        self._emit("training_start", self)
        epoch = 0
        step = int(np.asarray(state.step))
        prev_metrics = None
        try:
            while (num_epochs is None or epoch < num_epochs) and \
                    (max_steps is None or step < max_steps):
                self._emit("epoch_start", epoch)
                for batch in dataloader:
                    state, metrics = self.interface.train_step(state, batch)
                    self.state = state
                    step += 1
                    if prev_metrics is not None:
                        self.interface.check_finite(prev_metrics)
                        self._emit("batch_end", step - 1, prev_metrics)
                    prev_metrics = metrics
                    if step % 100 == 0:
                        # Long-haul hygiene: dropped host batch buffers can
                        # linger in cycles / client staging pools; reclaim
                        # periodically (large-batch runs otherwise grow RSS
                        # by ~the upload size per step).
                        import gc
                        gc.collect()
                    if max_steps is not None and step >= max_steps:
                        break
                if prev_metrics is not None:
                    self.interface.check_finite(prev_metrics)
                    self._emit("batch_end", step, prev_metrics)
                    prev_metrics = None
                if val_dataloader is not None:
                    val = self.validate(state, val_dataloader)
                    self._emit("validation_end", epoch, val)
                self._emit("epoch_end", epoch)
                epoch += 1
        except KeyboardInterrupt:
            LOG.info("training interrupted")
            self._emit("training_end")
        else:
            # On hard failures (e.g. the NaN-loss guard) do NOT run the
            # end-of-training hooks: a final checkpoint of corrupted state
            # would shadow the last good one.
            self._emit("training_end")
        return state

    def train_reservoir(self, state, reservoir, feeder=None, max_steps=None,
                        refresh_every=1, val_dataloader=None,
                        val_interval=2000, epoch_emit_every=1000):
        """Device-reservoir training loop (see train/reservoir.py).

        Per step: optionally refresh one HBM slot with a freshly decoded
        tile (non-blocking — the feeder decodes in the background and the
        slot write is async-dispatched), then run the compiled
        sample-from-reservoir step. Callbacks see the same batch_end
        events as :meth:`train`.
        """
        self.state = state
        self._emit("training_start", self)
        step = int(np.asarray(state.step))
        prev_metrics = None
        refreshed = 0
        try:
            while max_steps is None or step < max_steps:
                if feeder is not None and step % refresh_every == 0:
                    item = feeder.poll()
                    if item is not None:
                        reservoir.refresh(item)
                        refreshed += 1
                state, metrics = reservoir.train_step(state)
                self.state = state
                step += 1
                if prev_metrics is not None:
                    self.interface.check_finite(prev_metrics)
                    self._emit("batch_end", step - 1, prev_metrics)
                prev_metrics = metrics
                if step % epoch_emit_every == 0:
                    # The reservoir loop has no epochs; fire epoch_end
                    # every epoch_emit_every steps so epoch-driven
                    # callbacks (display strips) still report during
                    # long runs.
                    self._emit("epoch_end", step // epoch_emit_every)
                if step % 100 == 0:
                    import gc
                    gc.collect()
                if val_dataloader is not None and step % val_interval == 0:
                    val = self.validate(state, val_dataloader)
                    self._emit("validation_end", step // val_interval, val)
            if prev_metrics is not None:
                self.interface.check_finite(prev_metrics)
                self._emit("batch_end", step, prev_metrics)
        except KeyboardInterrupt:
            LOG.info("training interrupted")
            self._emit("training_end")
        else:
            self._emit("training_end")
        finally:
            if feeder is not None:
                feeder.stop()
        LOG.info("reservoir refreshes: %d over %d steps", refreshed, step)
        return state

    def validate(self, state, dataloader):
        """Running-mean validation (reference: sbmc/interfaces.py:108-132)."""
        running = {"loss": 0.0, "rmse": 0.0}
        n = 0
        for batch in dataloader:
            metrics = self.interface.eval_step(state.params, batch)
            b = batch["target_image"].shape[0]
            n += b
            for k in running:
                running[k] -= (1.0 / n) * (running[k]
                                           - b * float(metrics[k]))
        running["n"] = n
        return running
