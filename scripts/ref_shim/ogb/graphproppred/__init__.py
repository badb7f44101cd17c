"""Typing-only stub: the reference imports PygGraphPropPredDataset purely
for annotations (loader/loader.py:6, hetero_data.py:5, train_clustering.py:4)
and never instantiates it."""


class PygGraphPropPredDataset:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "PygGraphPropPredDataset stub: the reference only uses this "
            "class in type annotations; instantiating it is unsupported "
            "in the shim environment.")
