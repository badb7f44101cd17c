"""graph-hscn-tpu: TPU-native GNN framework (Graph-HSCN model family).

Public API surface; see README.md for the architecture map against the
reference implementation.
"""

from graph_hscn_tpu.config.config import (CompatConfig, DataConfig,
                                          ExperimentConfig, HSCNConfig,
                                          MeshConfig, MPNNConfig,
                                          OptimConfig, PEConfig,
                                          RuntimeConfig, TrainingConfig,
                                          load_config, parse_config)
from graph_hscn_tpu.data.batching import GraphData, PadBudget, pack_batch
from graph_hscn_tpu.data.pipeline import DataModule
from graph_hscn_tpu.data.structures import DenseGraphBatch, GraphBatch
from graph_hscn_tpu.runner import run_experiment

__version__ = "0.1.0"

__all__ = [
    "CompatConfig", "DataConfig", "DataModule", "DenseGraphBatch",
    "ExperimentConfig", "GraphBatch", "GraphData", "HSCNConfig",
    "MeshConfig", "MPNNConfig", "OptimConfig", "PEConfig", "PadBudget",
    "RuntimeConfig", "TrainingConfig", "load_config", "pack_batch",
    "parse_config", "run_experiment",
]
