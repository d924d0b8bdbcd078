"""Minimal training driver over the jitted train steps.

The reference ships inference only; training produced its checkpoints
offline (SURVEY.md section 2.3). This driver closes the loop: feed batches,
step the optimizer, optionally shard data-parallel over a mesh — enough to
fine-tune PyanNet (PIT-BCE) or ECAPA (AAM-softmax) on TPU.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_spec, replicated
from . import training as T


class Trainer:
    """Wraps a train step with jit/pjit, state management, and a fit loop."""

    def __init__(
        self,
        params,
        make_step: Callable[[optax.GradientTransformation], Callable],
        optimizer: Optional[optax.GradientTransformation] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.optimizer = optimizer or optax.adam(1e-3)
        self.state = T.TrainState(
            params, self.optimizer.init(params), jnp.zeros((), jnp.int32)
        )
        step = make_step(self.optimizer)
        if mesh is not None:
            state_sharding = jax.tree.map(lambda _: replicated(mesh), self.state)

            def in_shardings(n_batch_args):
                return (state_sharding,) + tuple(
                    None for _ in range(n_batch_args)
                )

            # shard batch args on the data axis lazily at call time
            self._mesh = mesh
            self._step = jax.jit(
                step,
                in_shardings=None,
                out_shardings=(state_sharding, replicated(mesh)),
            )
        else:
            self._mesh = None
            self._step = jax.jit(step)

    def _shard(self, x):
        if self._mesh is None:
            return x
        return jax.device_put(x, batch_spec(self._mesh, jnp.ndim(x)))

    def step(self, *batch):
        batch = tuple(self._shard(jnp.asarray(b)) for b in batch)
        self.state, loss = self._step(self.state, *batch)
        return float(loss)

    def fit(
        self,
        batches: Iterable,
        steps: Optional[int] = None,
        log_every: int = 50,
        log_fn=print,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 500,
    ):
        manager = None
        if checkpoint_dir is not None:
            from ..utils.checkpoint import CheckpointManager

            manager = CheckpointManager(checkpoint_dir)
        losses = []
        for i, batch in enumerate(batches):
            if steps is not None and i >= steps:
                break
            loss = self.step(*batch)
            losses.append(loss)
            if log_every and (i + 1) % log_every == 0:
                recent = sum(losses[-log_every:]) / min(log_every, len(losses))
                log_fn(f"step {i + 1}: loss {recent:.4f}")
            if manager is not None and checkpoint_every and (
                int(self.state.step) % checkpoint_every == 0
            ):
                manager.save(int(self.state.step), self.state)
        if manager is not None:
            manager.save(int(self.state.step), self.state)
        return losses

    # ------------------------------------------------------------------
    # checkpoint / resume (the reference persists only immutable ONNX
    # blobs, speakerDiarizer.cpp:2958/:3043 — training state needs more)
    # ------------------------------------------------------------------

    def save_checkpoint(self, directory: str) -> str:
        from ..utils.checkpoint import CheckpointManager

        return CheckpointManager(directory).save(int(self.state.step), self.state)

    def restore_checkpoint(self, directory: str, step: Optional[int] = None) -> int:
        """Restore the full TrainState (params + optimizer state + step)
        in place; returns the restored step number."""
        from ..utils.checkpoint import CheckpointManager

        self.state, step = CheckpointManager(directory).restore(self.state, step)
        return step

    @property
    def params(self):
        return self.state.params


def segmentation_trainer(
    params, cfg=None, optimizer=None, mesh=None
) -> Trainer:
    from .pyannet import PyanNetConfig

    cfg = cfg or PyanNetConfig()
    return Trainer(
        params,
        lambda opt: T.make_segmentation_train_step(opt, cfg),
        optimizer=optimizer,
        mesh=mesh,
    )
