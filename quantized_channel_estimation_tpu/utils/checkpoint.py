"""Orbax-backed training checkpoints (SURVEY §5: checkpoint/resume).

The config-keyed .npz caches in `utils.io` cover the reference's
joblib-style fitted-model persistence (`Bussgang_GMM.py:267-278`). This
module is the *training-state* layer — the analog of the reference's
per-epoch `torch.save` of `{model, optim, loss_all, epoch, params}`
(`estimators/vae.py:148-153`) — built on Orbax so checkpoints are atomic,
step-numbered, retention-managed, and safe under multi-host writers
(every host calls save; Orbax coordinates a single atomic commit).

Any pytree of arrays works: a `GmmParams` bank mid-EM, a VAE
`TrainState`, optimizer moments. Restore takes an example pytree of the
same structure (abstract arrays are fine) so leaf types round-trip.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


class TrainCheckpointer:
    """Step-numbered checkpoints with retention, atomic commits, resume.

    Usage (save(epoch, state) records the state AFTER that epoch, so a
    resume continues at latest_step() + 1 — restarting AT latest_step()
    would silently train that epoch twice):
        ckpt = TrainCheckpointer(dir, max_to_keep=3)
        last = ckpt.latest_step()            # None if fresh
        state = ckpt.restore(last, state)    # no-op if last is None
        start = 0 if last is None else last + 1
        for epoch in range(start, epochs):
            ...
            ckpt.save(epoch, state)
        ckpt.close()
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Persist `state` (any pytree of arrays) at `step`. Returns True if
        a checkpoint was actually written (save_interval/retention may
        skip)."""
        saved = self._mngr.save(
            step, args=self._ocp.args.StandardSave(state), force=force)
        return bool(saved)

    def restore(self, step: Optional[int], example: Any) -> Any:
        """Restore the pytree saved at `step` (or `example` unchanged if
        step is None). `example` provides structure/dtypes/shapes — and
        shardings: each leaf restores onto the example leaf's own sharding
        (falling back to the default device), NOT the sharding recorded in
        the checkpoint, so a checkpoint written on one topology (e.g. the
        TPU) restores on another (e.g. CPU debugging, a resized mesh)."""
        if step is None:
            return example
        default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def _abstract(x):
            sharding = getattr(x, "sharding", None) or default
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

        abstract = jax.tree_util.tree_map(_abstract, example)
        return self._mngr.restore(
            step, args=self._ocp.args.StandardRestore(abstract))

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
