"""Checkpoint / resume subsystem (Orbax-backed).

The reference only has save-only best-model pickles (scripts.py:286,532;
SURVEY §5.4). Here checkpoints capture the full training state — model
variables, optimizer state, epoch counter, PRNG key, best-score dict — so
training resumes deterministically after preemption.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _to_numpy(tree):
    return jax.tree.map(np.asarray, tree)


class TrainCheckpointer:
    """Periodic + best checkpoints with resume.

    Uses Orbax PyTreeCheckpointer when available (directory per step),
    falling back to pickles. Layout:
        <dir>/step_<n>/   or  <dir>/step_<n>.pkl
        <dir>/best/       or  <dir>/best.pkl
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer() if _HAVE_ORBAX else None

    # -- save ------------------------------------------------------------

    def save(self, step: int, state: Dict[str, Any],
             best: bool = False) -> None:
        state = _to_numpy(state)
        name = "best" if best else f"step_{step}"
        if self._ckptr is not None:
            path = os.path.join(os.path.abspath(self.directory), name)
            self._ckptr.save(path, state, force=True)
        else:
            with open(os.path.join(self.directory, name + ".pkl"), "wb") as f:
                pickle.dump(state, f)
        if not best:
            self._gc()

    def _steps(self):
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("step_"):
                out.append(int(d.split("_")[1].split(".")[0]))
        return sorted(set(out))

    def _gc(self):
        steps = self._steps()
        for s in steps[: -self.keep]:
            for suffix in ("", ".pkl"):
                p = os.path.join(self.directory, f"step_{s}{suffix}")
                if os.path.isdir(p):
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
                elif os.path.isfile(p):
                    os.remove(p)

    # -- restore ---------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None,
                best: bool = False) -> Optional[Dict[str, Any]]:
        name = "best" if best else (
            f"step_{step if step is not None else self.latest_step()}"
        )
        if name == "step_None":
            return None
        dir_path = os.path.join(os.path.abspath(self.directory), name)
        pkl_path = os.path.join(self.directory, name + ".pkl")
        if self._ckptr is not None and os.path.isdir(dir_path):
            return self._ckptr.restore(dir_path)
        if os.path.isfile(pkl_path):
            with open(pkl_path, "rb") as f:
                return pickle.load(f)
        return None
