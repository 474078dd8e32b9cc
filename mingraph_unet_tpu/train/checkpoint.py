"""Composite checkpoint save / resume via Orbax.

Fills a capability gap called out in SURVEY §5: the reference saves a
checkpoint dict for U-Net-only training (``train_segmentation.py:154-169``),
has a print-only stub for the end-to-end model (``train_end_to_end.py:500-504``)
and has **no resume logic anywhere**. Here one pytree
``{params, batch_stats, opt_state, step, epoch}`` covering *all* modules is
saved step-indexed and restored for exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Orbax-backed manager with async saves and optional best-metric
    retention.

    ``best_metric``: when set, retention keeps the ``max_to_keep`` *best*
    checkpoints by that key of the ``metrics`` dict passed to :meth:`save`
    (``best_mode`` 'min' for losses, 'max' for accuracies) instead of the
    newest. Saves are asynchronous (Orbax default) — the train loop keeps
    running while the checkpoint writes; :meth:`wait` joins.
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
        best_metric: Optional[str] = None,
        best_mode: str = "min",
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.best_metric = best_metric
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            best_fn=(lambda m: float(m[best_metric])) if best_metric else None,
            best_mode=best_mode,
        )
        # Registering the handler up front lets ``item_metadata`` work on a
        # fresh manager (otherwise it returns None with "could not be
        # restored" warnings), which restore_latest needs to build the typed
        # abstract target.
        self._mngr = ocp.CheckpointManager(
            directory, options=options, item_handlers=ocp.StandardCheckpointHandler()
        )

    @property
    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def save(
        self,
        step: int,
        state: Dict[str, Any],
        force: bool = False,
        metrics: Optional[Dict[str, float]] = None,
    ) -> bool:
        saved = self._mngr.save(
            step, args=ocp.args.StandardSave(state), force=force, metrics=metrics
        )
        return bool(saved)

    def restore_latest(self, abstract_state: Optional[Dict[str, Any]] = None) -> Optional[Dict[str, Any]]:
        """Restore the newest checkpoint (None if the directory is empty).

        ``abstract_state``: optional matching pytree of ``jax.ShapeDtypeStruct``
        (e.g. from ``jax.eval_shape``) to restore with correct shardings/dtypes.
        """
        step = self._mngr.latest_step()
        if step is None:
            return None
        if abstract_state is None:
            # Build an abstract target from the stored metadata so Orbax
            # restores with known shapes/dtypes (avoids its "UNSAFE" untyped
            # restore path and the associated warnings).
            try:
                meta = self._mngr.item_metadata(step).tree
                abstract_state = jax.tree_util.tree_map(
                    lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta
                )
            except Exception:
                return self._mngr.restore(step)
        return self._mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()
