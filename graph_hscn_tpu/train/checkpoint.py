"""Checkpoint / resume via orbax.

The reference defines MODEL_DIR but never saves anything (constants.py:6,
SURVEY §5 "checkpoint/resume: absent") — this is a new capability:
  - ``save_best``   : best-val snapshot at each improving eval
  - ``save_latest`` : periodic resumable snapshot (params + opt state +
                      step + rng)
  - ``restore``     : rebuild a TrainState pytree
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from graph_hscn_tpu.train.loop import TrainState


class Checkpointer:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _save(self, name: str, state: TrainState, meta: dict) -> None:
        path = self.dir / name
        payload = {
            "params": jax.tree_util.tree_map(np.asarray, state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
            "step": np.asarray(state.step),
            "rng": np.asarray(state.rng),
        }
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        # Metadata as a sidecar (keeps the orbax tree template uniform).
        (self.dir / f"{name}.meta.json").write_text(json.dumps(meta))

    def save_best(self, state: TrainState, epoch: int, val_loss: float
                  ) -> None:
        self._save("best", state,
                   {"epoch": epoch, "val_loss": val_loss})

    def save_latest(self, state: TrainState, epoch: int) -> None:
        self._save("latest", state, {"epoch": epoch})

    def restore(self, name: str, example_state: TrainState
                ) -> tuple[TrainState, dict]:
        """Restore into the structure of ``example_state`` (from
        init_state on the same model/optimizer)."""
        path = self.dir / name
        template = {
            "params": jax.tree_util.tree_map(np.asarray,
                                             example_state.params),
            "opt_state": jax.tree_util.tree_map(np.asarray,
                                                example_state.opt_state),
            "step": np.asarray(example_state.step),
            "rng": np.asarray(example_state.rng),
        }
        restored = self._ckptr.restore(path, template)
        state = TrainState(params=restored["params"],
                           opt_state=restored["opt_state"],
                           step=restored["step"], rng=restored["rng"])
        meta_path = self.dir / f"{name}.meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return state, meta

    def has(self, name: str) -> bool:
        return (self.dir / name).exists()

    def meta(self, name: str) -> dict:
        """Sidecar metadata of a snapshot without restoring its arrays."""
        meta_path = self.dir / f"{name}.meta.json"
        return json.loads(meta_path.read_text()) if meta_path.exists() \
            else {}
