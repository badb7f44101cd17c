"""Interpreter-start shims for executing the mounted reference in-image.

Put this directory FIRST on PYTHONPATH for the reference subprocess only
(scripts/parity_run.py does this); it never touches the framework's own
environment.  Two environmental deltas between the reference's pinned stack
(torch 1.13 / pydantic 1.x, requirements-cpu.txt) and this image are papered
over here so `/root/reference` code runs byte-for-byte unmodified:

1. pydantic 2.x is installed, but the reference uses the v1 API
   (`from pydantic import BaseModel, root_validator, validator`,
   `parse_obj`; /root/reference/graph_hscn/config/config.py:6).
   pydantic 2 bundles the full v1 implementation as `pydantic.v1`; remap
   the top-level name so the reference resolves to it.

2. torch 2.x flipped `torch.load(weights_only=...)` to True by default;
   the reference's datasets call bare `torch.load(self.processed_paths[0])`
   (peptides_functional.py:46) on a pickled (Data, slices) tuple, which the
   weights-only unpickler rejects.  Restore the torch-1.13 default the
   reference was written against.
"""

import sys

import pydantic.v1

sys.modules["pydantic"] = pydantic.v1

import functools  # noqa: E402

import torch  # noqa: E402

_orig_load = torch.load


@functools.wraps(_orig_load)
def _load_compat(*args, **kwargs):
    kwargs.setdefault("weights_only", False)
    return _orig_load(*args, **kwargs)


torch.load = _load_compat
