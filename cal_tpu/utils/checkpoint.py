"""Checkpoint / resume — new scope (the reference persists nothing:
``--save_model`` exists but is consumed nowhere, reference opts.py:35,
SURVEY.md §5).  Orbax-backed with a plain-pickle fallback.

Layout: <dir>/<step>/ managed by orbax CheckpointManager (keeps the last
``max_to_keep``); the saved tree is the full TrainState (params, batch_stats,
opt_state, step) plus a small metadata dict.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


class Checkpointer:
    """Minimal checkpoint manager (orbax when available, pickle fallback)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        try:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, create=True
                ),
            )
        except Exception:  # noqa: BLE001 — fall back to pickle
            self._mgr = None

    # -- orbax path --------------------------------------------------------
    def save(self, step: int, state: Any, metadata: dict | None = None):
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardSave(state),
                    meta=ocp.args.JsonSave(metadata or {}),
                ),
            )
            self._mgr.wait_until_finished()
            return
        payload = {"state": state, "metadata": metadata or {}}
        path = os.path.join(self.directory, f"ckpt_{step}.pkl")
        with open(path, "wb") as f:
            pickle.dump(_to_host(payload), f)
        self._gc_pickles()

    def restore(self, step: int | None = None, template: Any = None):
        """Returns (state, metadata) at ``step`` (default: latest), or
        (None, None) if nothing is saved.  With ``template`` (a pytree of
        the same structure, e.g. a freshly-initialized TrainState), the
        restored state keeps the template's exact node types."""
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            step = self.latest_step() if step is None else step
            if step is None:
                return None, None
            if template is not None:
                args = ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    meta=ocp.args.JsonRestore(),
                )
            else:
                args = ocp.args.Composite(
                    state=ocp.args.StandardRestore(),
                    meta=ocp.args.JsonRestore(),
                )
            payload = self._mgr.restore(step, args=args)
            return payload["state"], payload["meta"] or {}
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        path = os.path.join(self.directory, f"ckpt_{step}.pkl")
        with open(path, "rb") as f:
            payload = pickle.load(f)
        return payload["state"], payload.get("metadata", {})

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._pickle_steps()
        return max(steps) if steps else None

    # -- pickle fallback helpers -------------------------------------------
    def _pickle_steps(self):
        return [
            int(f[5:-4])
            for f in os.listdir(self.directory)
            if f.startswith("ckpt_") and f.endswith(".pkl")
        ]

    def _gc_pickles(self):
        steps = sorted(self._pickle_steps())
        for s in steps[: -self.max_to_keep]:
            os.unlink(os.path.join(self.directory, f"ckpt_{s}.pkl"))
