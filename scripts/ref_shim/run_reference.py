"""Execute the reference CLI (main.py) with the one schema amendment the
HSCN path needs to run at all.

``main.py:102`` reads ``model_cfg.mp_units`` but ``HSCNConfig`` never
declares that field (/root/reference/graph_hscn/config/config.py:76-86 —
SURVEY.md quirk: a latent schema gap; pydantic v1 silently drops the
unknown YAML key, then attribute access raises).  We subclass HSCNConfig
to declare ``mp_units`` (defaulting to [hidden] like this framework's own
config) and patch it into the config module BEFORE main.py imports it.
The reference's source files are untouched; the MPNN path is unaffected.

Usage (from the writable reference copy, shim dir first on PYTHONPATH):
    python run_reference.py --cfg configs/parity.yaml
"""

import os
import runpy
import sys

import torch

import graph_hscn.config.config as _config_mod

# Optional determinism hook for parity runs (environmental, not a code
# change: the reference itself never seeds, so its runs vary run-to-run;
# scripts/parity_run.py --ref-seed pins this for reproducible artifacts).
_seed = os.environ.get("PARITY_TORCH_SEED")
if _seed is not None:
    torch.manual_seed(int(_seed))


class HSCNConfig(_config_mod.HSCNConfig):
    mp_units: list = [16]


_config_mod.HSCNConfig = HSCNConfig

sys.argv[0] = "main.py"
runpy.run_path("main.py", run_name="__main__")
