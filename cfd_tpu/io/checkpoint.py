"""Checkpoint / resume.

The reference has no recovery path at all — VTK outputs are write-only and a
killed run restarts from t=0 (SURVEY.md section 5.4). This module adds
periodic checkpoints of the full solver state (u, v, p, optional T, step)
with exact bitwise resume: restarting from a checkpoint reproduces the same
trajectory as an uninterrupted run because the step function is pure and the
state is the complete dynamical state (the Poisson warm start is p, which is
saved).

Format: one .npz per checkpoint (`ckpt_XXXXXXXX.npz`) + atomic rename, so a
crash mid-write never corrupts the latest checkpoint.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from cfd_tpu.state import State

_CKPT_RE = re.compile(r"ckpt_(\d{8})\.npz$")


class CheckpointManager:
    def __init__(self, directory: str | Path, interval: int = 500, keep: int = 3):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.interval = interval
        self.keep = keep

    def _path(self, step: int) -> Path:
        return self.dir / f"ckpt_{step:08d}.npz"

    def save(self, state: State, step: int,
             extras: dict[str, float] | None = None) -> Path:
        """``extras``: additional host-side scalars that are part of the
        dynamical state (the adaptive-dt controller's dt and t); stored with
        an ``extra_`` prefix and returned by ``restore(..., with_extras)``."""
        path = self._path(step)
        tmp = path.with_suffix(".tmp.npz")
        arrays = {"u": np.asarray(state.u), "v": np.asarray(state.v),
                  "p": np.asarray(state.p), "step": np.asarray(step)}
        if state.T is not None:
            arrays["T"] = np.asarray(state.T)
        if state.p_prev is not None:
            arrays["p_prev"] = np.asarray(state.p_prev)
        for k, v in (extras or {}).items():
            arrays[f"extra_{k}"] = np.asarray(v, dtype=np.float64)
        np.savez(tmp, **arrays)
        os.replace(tmp, path)  # atomic on POSIX
        self._prune()
        return path

    def maybe_save(self, state: State, step: int,
                   extras: dict[str, float] | None = None) -> Path | None:
        if self.interval > 0 and step % self.interval == 0:
            return self.save(state, step, extras)
        return None

    def latest_step(self) -> int | None:
        steps = [int(m.group(1)) for f in self.dir.iterdir()
                 if (m := _CKPT_RE.search(f.name))]
        return max(steps) if steps else None

    def restore(self, step: int, case=None, with_extras: bool = False):
        with np.load(self._path(step)) as z:
            dtype = None if case is None else case.dtype
            state = State(
                u=jnp.asarray(z["u"], dtype=dtype),
                v=jnp.asarray(z["v"], dtype=dtype),
                p=jnp.asarray(z["p"], dtype=dtype),
                T=jnp.asarray(z["T"], dtype=dtype) if "T" in z else None,
                p_prev=jnp.asarray(z["p_prev"], dtype=dtype) if "p_prev" in z else None,
            )
            if (state.p_prev is None and case is not None
                    and getattr(case, "extrapolate_warm_start", False)):
                # checkpoint written before the case enabled the
                # extrapolated warm start: seed p_prev = p (the
                # non-extrapolated warm start for the first resumed step;
                # convergence stays tolerance-enforced)
                state = State(state.u, state.v, state.p, state.T, state.p)
            if with_extras:
                extras = {k[len("extra_"):]: float(z[k])
                          for k in z.files if k.startswith("extra_")}
                return state, int(z["step"]), extras
            return state, int(z["step"])

    def restore_latest(self, case=None, with_extras: bool = False):
        """(state, step[, extras]) of the newest checkpoint, or (None, 0[, {}])."""
        step = self.latest_step()
        if step is None:
            return (None, 0, {}) if with_extras else (None, 0)
        return self.restore(step, case, with_extras)

    def _prune(self) -> None:
        files = sorted(f for f in self.dir.iterdir() if _CKPT_RE.search(f.name))
        for f in files[: -self.keep]:
            f.unlink()
