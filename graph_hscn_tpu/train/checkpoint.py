"""Checkpoint / resume via orbax.

The reference defines MODEL_DIR but never saves anything (constants.py:6,
SURVEY §5 "checkpoint/resume: absent") — this is a new capability:
  - ``save_best``   : best-val snapshot at each improving eval
  - ``save_latest`` : periodic resumable snapshot (params + opt state +
                      step + rng)
  - ``restore``     : rebuild a TrainState pytree

Writes are asynchronous by default: ``_save`` does one batched
device→host readback (``jax.device_get``) on the caller's thread, then
hands the host payload to a background thread for the orbax write +
meta sidecar, so the training loop resumes stepping immediately instead
of stalling on disk I/O (matters on the giant-graph full-batch paths
where a snapshot write rivals the 45-90 ms step time).  At most one
write is in flight; every read/save entry point fences on it first, and
a background failure re-raises at the next fence.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from graph_hscn_tpu.train.loop import TrainState


class Checkpointer:
    def __init__(self, directory: str | Path, async_writes: bool = True):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_writes = async_writes
        self._pending: threading.Thread | None = None
        self._error: BaseException | None = None

    def wait(self) -> None:
        """Block until any in-flight write has landed; re-raise its error."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def _save(self, name: str, state: TrainState, meta: dict) -> None:
        self.wait()   # serialize: one write in flight, best/latest ordered
        path = self.dir / name
        # Batched device->host readback (synchronous — the cheap part);
        # np.asarray afterwards only coerces scalar leaves.
        host = jax.device_get({
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        })
        payload = jax.tree_util.tree_map(np.asarray, host)

        def write():
            try:
                self._ckptr.save(path, payload, force=True)
                self._ckptr.wait_until_finished()
                # Metadata as a sidecar (keeps the orbax tree template
                # uniform).  Written last: its presence marks a complete
                # snapshot.
                (self.dir / f"{name}.meta.json").write_text(json.dumps(meta))
            except BaseException as e:    # surfaced at the next fence
                self._error = e

        if self.async_writes:
            t = threading.Thread(target=write, name=f"ckpt-write-{name}",
                                 daemon=True)
            t.start()
            self._pending = t
        else:
            write()
            self.wait()

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
        self.wait()
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
        """A snapshot counts as present only when its meta sidecar exists —
        the sidecar is written last and marks a COMPLETE snapshot.  A crash
        between orbax finalize and the meta write must not let resume
        restore epoch-N weights paired with a stale/absent epoch."""
        self.wait()
        return ((self.dir / name).exists()
                and (self.dir / f"{name}.meta.json").exists())

    def meta(self, name: str) -> dict:
        """Sidecar metadata of a snapshot without restoring its arrays."""
        self.wait()
        meta_path = self.dir / f"{name}.meta.json"
        return json.loads(meta_path.read_text()) if meta_path.exists() \
            else {}
