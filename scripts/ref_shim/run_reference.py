"""Execute the reference CLI (main.py) with the documented amendments the
broken-as-committed paths need to run at all.  The reference's source
files are untouched; every amendment is a module-attribute patch applied
BEFORE main.py imports the symbols, and each is listed in the parity
artifact's provenance.

1. ``mp_units`` (HSCN path): main.py:102 reads ``model_cfg.mp_units``
   but ``HSCNConfig`` never declares that field
   (/root/reference/graph_hscn/config/config.py:76-86 — a latent schema
   gap; pydantic v1 silently drops the unknown YAML key, then attribute
   access raises).  We subclass HSCNConfig to declare it (defaulting to
   [hidden] like this framework's own config).

2. ``ACT_DICT['activation']`` (PE path, SURVEY.md quirk #5): the SignNet
   MLP looks up the literal string "activation"
   (/root/reference/graph_hscn/encoder/signnet.py:49) instead of its
   ``activation`` argument — a KeyError that makes the PE path crash on
   construction.  Every SignNet call site requests relu
   (signnet.py:330-340 hard-codes activation="relu"; the MLP default is
   also "relu"), so adding the key resolving to F.relu executes exactly
   the lookup the code intends.

3. ``compute_posenc`` loader rebuild (PE path): the committed function
   (train.py:29-51) appends whole Batch objects into the lists it hands
   to ``get_loader``, producing loaders of batches-of-Batches — a path
   that never executed (the PE stack crashes first, amendment 2) and
   whose collation PyG leaves undefined.  The wrapper re-implements the
   function line-for-line with one change: the rebuilt loaders are fed
   the separated per-graph Data (``batch.to_data_list()``), preserving
   the configured batch size; the returned dataset stays the list of
   encoded Batch objects main.py:97 expects
   (``get_each_data_from_batch`` flattens it).

Usage (from the writable reference copy, shim dir first on PYTHONPATH):
    python run_reference.py --cfg configs/parity.yaml
"""

import os
import runpy
import sys

import torch
import torch.nn.functional as F

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

# Amendment 2: make the SignNet MLP's broken lookup resolve to the relu
# its call sites request (quirk #5).
_config_mod.ACT_DICT["activation"] = F.relu

# Amendment 3: per-graph loaders out of compute_posenc (see module
# docstring).  Patched on the module object before main.py's
# ``from graph_hscn.train.train import compute_posenc`` binds it.
import graph_hscn.train.train as _train_mod  # noqa: E402


def _compute_posenc(_loaders, _data_cfg, _num_features, _pe_cfg, _logger):
    from graph_hscn.encoder.signnet import SignNetNodeEncoder
    from graph_hscn.loader.loader import get_loader
    _enc = SignNetNodeEncoder(_pe_cfg, _num_features, _pe_cfg.dim_emb)
    loaders_new = []
    dataset_lst = []
    _logger.info("Running PE for each loader...")
    for i, loader in enumerate(_loaders):
        data_list = []
        flat = []
        with torch.no_grad():
            for batch in loader:
                enc_batch = _enc(batch)
                data_list.append(enc_batch)
                flat.extend(enc_batch.to_data_list())
            loaders_new.append(
                get_loader(flat, _data_cfg, shuffle=(i == 0)))
        dataset_lst.append(data_list)
    return loaders_new, sum(dataset_lst, [])


_train_mod.compute_posenc = _compute_posenc

sys.argv[0] = "main.py"
runpy.run_path("main.py", run_name="__main__")
