"""CLI entry point: ``python main.py --cfg configs/GCN/peptides_func_GCN.yaml``.

Drop-in replacement for the reference's main.py:28-135 (same flag, same YAML
schema, same project-name derivation) dispatching to the TPU-native pipeline:

  MPNN path : config -> DataModule -> padded batches -> MPNN -> fit
  HSCN path : + SCN clustering pre-train -> cluster assignments ->
              virtual-node hetero batches -> HSCN -> fit
"""

from __future__ import annotations

import argparse
from pathlib import Path

from graph_hscn_tpu.config.config import ExperimentConfig, load_config
from graph_hscn_tpu.constants import LOGS_DIR
from graph_hscn_tpu.runner import run_eval, run_experiment


def main() -> None:
    parser = argparse.ArgumentParser(description="Graph-HSCN TPU CLI")
    parser.add_argument("--cfg", type=str, required=True,
                        help="Config file to use.")
    parser.add_argument("--eval", type=str, default=None, metavar="SNAP",
                        help="Eval-only mode: restore the named snapshot "
                             "('best' or 'latest') from "
                             "training.checkpoint_dir and score val/test "
                             "instead of training.")
    parser.add_argument("--predict", type=str, default=None,
                        metavar="OUT.npz",
                        help="With --eval: also export per-row prediction "
                             "scores and targets ({split}_scores / "
                             "{split}_targets) to the given .npz.")
    args = parser.parse_args()
    if args.predict and not args.eval:
        parser.error("--predict requires --eval")
    cfg: ExperimentConfig = load_config(args.cfg)
    LOGS_DIR.mkdir(parents=True, exist_ok=True)
    log_file = LOGS_DIR / (f"{cfg.data.dataset_name}_"
                           f"{cfg.training.model_type}.log")
    if args.eval:
        run_eval(cfg, which=args.eval, log_file=log_file,
                 predict_out=args.predict)
    else:
        run_experiment(cfg, log_file=log_file)


if __name__ == "__main__":
    main()
