"""Orbax checkpointing: step-interval saves, save_last, resume.

TPU-native replacement for the reference's Lightning CheckpointHook
(``src/callbacks/model_checkpoint.py:8-23`` of hhhhzp/DeCo): step-interval
saves with ``save_top_k=-1`` (keep all), a ``last`` alias, and three loading
modes mirroring SURVEY §5 checkpoint/resume:

1. full resume (step + params + ema + opt state),
2. partial warm start (params/ema only, missing keys kept at init),
3. denoiser-only load (choose ``params`` or ``ema_params`` subtree).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from deco_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, every_n_steps: int = 10000,
                 max_to_keep: Optional[int] = None, save_last: bool = True):
        self.directory = os.path.abspath(directory)
        self.every_n_steps = every_n_steps
        self.save_last = save_last
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, state: TrainState, force: bool = False,
                   step: Optional[int] = None) -> bool:
        # callers that track the step on the host pass it to avoid forcing a
        # device sync on every call (the async train loop relies on this)
        step = int(state.step) if step is None else int(step)
        if not force and (self.every_n_steps <= 0 or step % self.every_n_steps != 0):
            return False
        payload = dict(
            step=step,
            params=state.params,
            ema_params=state.ema_params,
            opt_state=state.opt_state,
        )
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Full resume into an existing (abstract) state."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = dict(
            step=int(state.step),
            params=state.params,
            ema_params=state.ema_params,
            opt_state=state.opt_state,
        )
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            params=restored["params"],
            ema_params=restored["ema_params"],
            opt_state=restored["opt_state"],
        )

    def restore_params(self, state: TrainState, step: Optional[int] = None,
                       use_ema: bool = False) -> Any:
        """Denoiser-only / warm-start load: returns just the param tree."""
        restored = self.restore(state, step)
        return restored.ema_params if use_ema else restored.params

    # ---- generic pytree payloads (non-TrainState workloads: VAE-GAN) ----

    def maybe_save_payload(self, step: int, payload: dict,
                           force: bool = False) -> bool:
        """Step-interval save of an arbitrary pytree payload (the VAE-GAN
        two-optimizer state doesn't fit the TrainState layout)."""
        step = int(step)
        if not force and (self.every_n_steps <= 0 or step % self.every_n_steps != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        return True

    def restore_payload(self, template: dict, step: Optional[int] = None) -> dict:
        """Restore an arbitrary payload into the shape/dtype of ``template``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
