"""Checkpoint / resume for sequence processing (SURVEY.md §5).

The reference keeps all state in closure-captured locals — a crash loses
the trajectory (examples/scan2d.rs:65-67).  Here the odometry/SLAM state is
a plain pytree (current transform, trajectory, map buffer, frame cursor)
saved every K frames; resume = reload + seek.

Format: plain atomic npz (the state is a handful of small arrays — a
heavyweight checkpointing dependency would buy nothing here).
Restart-based recovery: rerunning from the last checkpoint's frame
cursor reproduces the run bitwise (the engine is deterministic given the
(src, transform) state; verified by tests/test_resume.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

import jax


def save_state(path: str, state: Dict[str, Any]) -> None:
    """state: flat dict of name -> array/scalar (numpy-able)."""
    tmp = path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in state.items()})
    os.replace(tmp, path)


def load_state(path: str) -> Dict[str, np.ndarray] | None:
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class SequenceCheckpointer:
    """Every-K-frames checkpointing of an odometry/SLAM state pytree."""

    def __init__(self, path: str, every: int = 10):
        self.path = path
        self.every = every

    def maybe_save(self, frame: int, state: Dict[str, Any]) -> bool:
        if frame % self.every != 0:
            return False
        self.save(frame, state)
        return True

    def save(self, frame: int, state: Dict[str, Any]) -> None:
        """Unconditional save — phase boundaries (odometry chain done,
        loop edges verified, graph solved) checkpoint regardless of the
        every-K cadence."""
        state = dict(state)
        state["frame_cursor"] = np.asarray(frame)
        save_state(self.path, jax.tree.map(np.asarray, state))

    def restore(self) -> Dict[str, np.ndarray] | None:
        return load_state(self.path)
