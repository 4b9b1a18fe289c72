"""Checkpoint / resume via orbax.

Replaces both reference schemes (SURVEY.md §5): the wandb-file
``iter-%d-{model,ema_model,optimizer,scheduler}.th`` saves
(``diff_cifar/main.py:532-539``) and Lightning's best-val ``ModelCheckpoint``
(``configs/navierstokes2d.yaml:37-46``).  One orbax checkpointer stores the
whole :class:`~unet_design_tpu.train.trainer.TrainState`-shaped pytree plus a
JSON-serializable config/metrics dict.  The ``keep`` option covers the
periodic-iteration policy; best-so-far selection is the caller's concern —
each task tracks its own validation metric and saves under a dedicated step
key (e.g. ``wmh.py``/``pde.py``), matching the reference where the policy
lives in the trainer, not the writer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                     create=True))
        else:
            self._mgr = None
        self._keep = keep

    def save(self, step: int, state: Any,
             extra: Optional[Dict[str, Any]] = None) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # numpy fallback
            path = os.path.join(self.directory, f"step_{step}.npz")
            leaves, treedef = jax.tree_util.tree_flatten(state)
            np.savez(path, **{str(i): np.asarray(l)
                              for i, l in enumerate(leaves)})
        if extra is not None:
            with open(os.path.join(self.directory, f"extra_{step}.json"),
                      "w") as f:
                json.dump(extra, f)

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = [int(f[5:-4]) for f in os.listdir(self.directory)
                 if f.startswith("step_") and f.endswith(".npz")]
        return max(steps) if steps else None

    def restore(self, step: Optional[int], target: Any) -> Any:
        """Restore into the structure/shardings of ``target``."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if self._mgr is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(target))
        path = os.path.join(self.directory, f"step_{step}.npz")
        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(target)
        new_leaves = [data[str(i)] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore the saved tree as plain nested containers of arrays,
        without a target structure (for partial use, e.g. params/EMA only —
        optimizer states need :meth:`restore` with a typed target)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if self._mgr is not None:
            return self._mgr.restore(step)
        raise NotImplementedError(
            "restore_raw requires orbax (the npz fallback stores no treedef)")

    def load_extra(self, step: int) -> Optional[Dict[str, Any]]:
        path = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None
