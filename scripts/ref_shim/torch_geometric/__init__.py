"""Pure-torch torch_geometric stand-in for executing /root/reference
in-image (no network, no PyG wheels).

Scope: exactly the symbols the reference imports (SURVEY.md §2.3's native
capability table), implemented faithfully to the public PyG 2.x semantics
the reference was written against — plus the PyG-1.x behavior of returning
``None`` for absent Data attributes, which the reference relies on
(train_clustering.py:39 reads ``data.edge_weight`` before ever setting it).

This package lives on PYTHONPATH only for the reference subprocess of
``scripts/parity_run.py``; the framework itself never imports it.
"""

__version__ = "0.0-refshim"
