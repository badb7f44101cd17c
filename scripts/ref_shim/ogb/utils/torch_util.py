"""Faithful re-implementation of ogb.utils.torch_util's one used symbol.

``replace_numpy_with_torchtensor`` executes inside the reference's
``get_idx_split`` (peptides_functional.py:108-115) on the split pickle the
parity driver seeds; semantics mirror OGB: recursively convert numpy arrays
in dict/list containers to torch tensors.
"""

import numpy as np
import torch


def replace_numpy_with_torchtensor(obj):
    if isinstance(obj, dict):
        return {k: replace_numpy_with_torchtensor(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [replace_numpy_with_torchtensor(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return torch.from_numpy(obj)
    return obj
