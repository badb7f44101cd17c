"""Turnkey parity run: reference train -> framework train -> metric-delta
verdict (BASELINE.json 0.005-AP gate).

Modes for the reference phase (--mode):

  shim   (default) EXECUTE the mounted reference code in-image: copy
         /root/reference to a writable temp dir, pre-seed its dataset
         cache with the shared synthetic graphs, and run its main.py
         unmodified on pure-torch re-implementations of its PyG/OGB/wandb
         dependencies (scripts/ref_shim/).  No network or RDKit needed;
         both sides train on byte-identical data (one .npz, exported by
         scripts/export_synthetic_npz.py, consumed natively by the
         framework and converted to the reference's processed-dataset
         layout by scripts/ref_shim/seed_reference_data.py).
  cli    run the reference CLI as-is (requires a machine with real
         torch_geometric + RDKit + network for the LRGB download).
  stub   (--dry-run) fixed eval lines; validates orchestration only.

On this image a full verdict is one command:

    python scripts/parity_run.py --dataset peptides_func --model gcn \
        --num-graphs 512 --out PARITY_RESULT.json

Both sides read their hyperparameters from the SAME framework YAML (the
reference config is synthesized from it key-for-key), train with the
reference's early-stop semantics, and the verdict compares each side's
test metric at its best-val-loss eval epoch.

Provenance is recorded in the JSON: ``reference_code: executed`` for shim
mode (it is the reference's own Python, byte-unmodified, modulo the two
documented environment shims: pe disabled because the PE path crashes as
committed — SURVEY.md quirk #5 / main.py:41-44 passes pe_cfg=None — and
the HSCNConfig.mp_units field its own main.py:102 reads but never
declares, added by scripts/ref_shim/run_reference.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SHIM_DIR = REPO / "scripts" / "ref_shim"
GATE = 0.005

EVAL_RE = re.compile(
    r"(Validation|Test)\s*--\s*Loss:\s*([-\d.na]+),\s*(?:AP|MAE|F1):\s*"
    r"([-\d.na]+)")

# (dataset, model) -> framework config whose hyperparameters BOTH sides use.
FRAMEWORK_CFGS = {
    ("peptides_func", "gcn"): "configs/GCN/peptides_func_GCN.yaml",
    ("peptides_func", "gat"): "configs/GAT/peptides_func_GAT.yaml",
    ("peptides_func", "hscn"): "configs/HSCN/peptides_func_HSCN.yaml",
    ("peptides_struct", "gcn"): "configs/GCN/peptides_struct_GCN.yaml",
    # gcn_pe: same GCN pair with the SignNet PE subsystem ON on both
    # sides (the reference's PE path executes under the one-line
    # ACT_DICT amendment documented in scripts/ref_shim/run_reference.py).
    ("peptides_func", "gcn_pe"): "configs/GCN/peptides_func_GCN_PE.yaml",
}

# Keys each reference pydantic model accepts (config.py:32-152); anything
# else in the framework YAML is TPU-runtime config the reference has no
# analog for.
REF_MP_KEYS = ("conv_type", "activation", "hidden_channels", "num_layers",
               "dropout", "use_batch_norm", "use_layer_norm")
REF_HSCN_KEYS = ("activation", "lv_conv_type", "ll_conv_type",
                 "vv_conv_type", "hidden_channels", "num_layers",
                 "num_clusters", "cluster_epochs", "mp_units")
REF_OPTIM_KEYS = ("optim_type", "batch_accumulation", "clip_grad_norm",
                  "lr", "weight_decay")
REF_TRAIN_KEYS = ("model_type", "loss_fn", "metric", "eval_period",
                  "min_delta", "patience")
REF_PE_KEYS = ("dim_in", "dim_emb", "dim_pe", "model", "layers",
               "post_layers", "eigen_max_freqs", "eigvec_norm",
               "eigen_laplacian_norm", "phi_hidden_dim", "phi_out_dim",
               "pass_as_var", "use_bn")


def log(msg: str) -> None:
    print(f"[parity] {msg}", file=sys.stderr, flush=True)


def run_and_capture(cmd, cwd=None, env=None, timeout=None) -> str:
    """Run a phase, teeing stdout+stderr to our stderr and returning it."""
    log(f"run: {' '.join(map(str, cmd))}" + (f"  (cwd={cwd})" if cwd else ""))
    proc = subprocess.run(list(map(str, cmd)), cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    sys.stderr.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        raise RuntimeError(f"phase failed (rc={proc.returncode}): "
                           f"{' '.join(map(str, cmd))}")
    return proc.stdout + "\n" + proc.stderr


def best_val_test_metric(text: str):
    """Parse CustomLogger eval pairs; return (best_val_loss, test metric at
    that eval).  Both frameworks log Validation then Test per eval epoch
    (reference train.py:178-197; graph_hscn_tpu/train/loop.py)."""
    best = (float("inf"), None)
    pending_val = None
    for split, loss_s, metric_s in EVAL_RE.findall(text):
        try:
            loss, metric = float(loss_s), float(metric_s)
        except ValueError:
            continue
        if split == "Validation":
            pending_val = loss
        elif split == "Test" and pending_val is not None:
            if pending_val < best[0]:
                best = (pending_val, metric)
            pending_val = None
    return best


def reference_effective_splits(split: dict) -> dict:
    """Derive the splits the reference's HSCN stage EFFECTIVELY trains and
    evaluates on (SURVEY.md quirk #16, found in round 4 by execution).

    ``generate_hetero_data`` builds its hetero list in train/val/test
    POSITION order (/root/reference/graph_hscn/loader/hetero_data.py:34-42):
    position ``p`` of that list holds the graph whose ORIGINAL dataset id
    is ``order[p]`` with ``order = concat(train_idx, val_idx, test_idx)``.
    ``hetero_loaders`` then indexes the list with the original ids as if
    they were positions (hetero_data.py:97-99), so the reference's
    "train" loader actually contains the graphs ``order[train_idx]`` —
    a deterministic scramble of the partition (labels travel with each
    graph, so metrics stay well-defined; the three sets stay disjoint).

    The derivation is pinned against the executed reference in
    tests/test_ref_shim.py::test_hetero_loader_split_scramble.
    """
    order = np.concatenate(
        [split["train"], split["val"], split["test"]]).astype(np.int64)
    n = len(order)
    # Exact-partition check: every id 0..n-1 appears exactly once (an
    # out-of-range or duplicated id would otherwise slip past a
    # max-count check by pigeonhole and fail later as a raw IndexError).
    if order.min() < 0 or order.max() >= n or \
            not np.array_equal(np.sort(order), np.arange(n)):
        raise ValueError("splits must partition the dataset for the "
                         "reference's position/id confusion to be "
                         "well-defined")
    return {k: order[split[k].astype(np.int64)] for k in
            ("train", "val", "test")}


def write_effective_splits_npz(npz_path: Path, out_dir: Path) -> Path:
    """Copy the shared data cache with split_* replaced by the reference's
    effective (scrambled) splits; the framework trained on this cache is
    the apples-to-apples side of an HSCN parity pair."""
    z = dict(np.load(npz_path))
    split = {k: z[f"split_{k}"] for k in ("train", "val", "test")}
    eff = reference_effective_splits(split)
    for k, v in eff.items():
        z[f"split_{k}"] = v
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / npz_path.name
    np.savez_compressed(out, **z)
    return out


def seed_study_stats(rv: list, fv: list, gate: float,
                     higher_is_better: bool | None = None) -> dict:
    """Delta-of-means with its standard error and 95% CI (Welch), plus an
    explicit statement of what the study can resolve against the gate
    (round-4 verdict: no PASS whose CI spans the gate without saying so).

    ``higher_is_better`` (AP/F1 True, MAE False) adds direction-aware
    fields: the 0.005 gate is a PARITY gate, but the build goal is
    match-OR-BEAT — a framework mean on the better side of the gate is a
    win, not a failure, and ``meets_or_beats``/``verdict`` say so."""
    rv = np.asarray(rv, dtype=float)
    fv = np.asarray(fv, dtype=float)
    nr, nf = len(rv), len(fv)
    sr = float(np.std(rv, ddof=1)) if nr > 1 else float("nan")
    sf = float(np.std(fv, ddof=1)) if nf > 1 else float("nan")
    dom = float(np.mean(fv) - np.mean(rv))
    se = float(np.sqrt(sr ** 2 / nr + sf ** 2 / nf))
    # Welch-Satterthwaite dof; normal quantile fallback if scipy absent.
    try:
        from scipy import stats as sps
        df = (sr ** 2 / nr + sf ** 2 / nf) ** 2 / (
            (sr ** 2 / nr) ** 2 / (nr - 1) + (sf ** 2 / nf) ** 2 / (nf - 1))
        tq = float(sps.t.ppf(0.975, df))
    except Exception:
        df, tq = float("nan"), 1.96
    hw = tq * se
    resolved = bool(np.isfinite(hw) and hw <= gate)

    def _f(v):  # keep the artifact strict-JSON (no NaN literals)
        return float(v) if np.isfinite(v) else None
    out = {
        "reference": {"n": nr, "mean": float(np.mean(rv)), "std": _f(sr)},
        "framework": {"n": nf, "mean": float(np.mean(fv)), "std": _f(sf)},
        "delta_of_means": abs(dom),
        "delta_of_means_signed": dom,
        "se_delta": _f(se),
        "ci95_delta": [_f(dom - hw), _f(dom + hw)],
        "ci95_halfwidth": _f(hw),
        "welch_df": _f(df),
        "pass": bool(abs(dom) <= gate),
        "resolves_gate": resolved,
        "resolution": (
            f"CI half-width {hw:.4f} <= gate {gate}: the study can "
            "resolve the gate" if resolved else
            (f"CI half-width {hw:.4f} > gate {gate}: the observed delta "
             f"is consistent with parity but a true gap up to "
             f"{abs(dom) + hw:.4f} cannot be excluded at this n; per-seed "
             "training noise dominates" if np.isfinite(hw) else
             "n too small for a CI (need >= 2 seeds per side)")),
        "note": "the reference's own seed-to-seed test-metric spread "
                "exceeds the gate several-fold on this task; "
                "single-run deltas are dominated by training noise, "
                "so the gate is applied to the delta of seed means",
    }
    if higher_is_better is not None:
        # Signed improvement of the framework over the reference, in the
        # metric's better direction.
        adv = dom if higher_is_better else -dom
        out["direction"] = "higher_is_better" if higher_is_better \
            else "lower_is_better"
        out["framework_advantage"] = _f(adv)
        out["meets_or_beats"] = bool(adv >= -gate)
        ci_lo, ci_hi = dom - hw, dom + hw
        ci_touches_parity = bool(np.isfinite(hw)
                                 and ci_lo <= gate and ci_hi >= -gate)
        if abs(dom) <= gate:
            out["verdict"] = "parity"
        elif ci_touches_parity:
            # The point estimate sits outside the gate but the study
            # cannot distinguish it from parity — say that, with the
            # direction as a hint, instead of a hard better/worse call.
            out["verdict"] = ("consistent_with_parity"
                              + ("_framework_above" if adv > 0
                                 else "_framework_below"))
        elif adv > 0:
            out["verdict"] = "framework_better"
        else:
            out["verdict"] = "framework_worse"
    return out


def synthesize_reference_cfg(fw_cfg: dict, model: str,
                             ref_epochs: int | None) -> dict:
    """Translate the framework YAML into the reference's config schema so
    both sides train with identical hyperparameters.

    The reference always trains TrainingConfig.epochs (default 500) — its
    shipped YAML's ``max_epochs`` key is silently dropped by pydantic
    (SURVEY.md quirk #4).  We pin ``epochs`` to the framework's
    ``max_epochs`` explicitly, which for the shipped configs (500) equals
    the reference's effective behavior.
    """
    # PE rides the framework YAML: a ``pe: {use: true}`` block turns the
    # SignNet pipeline on for BOTH sides (the reference side needs the
    # documented one-line ACT_DICT amendment — quirk #5 — applied by
    # scripts/ref_shim/run_reference.py).  Without it, pe stays off
    # (the reference's shipped configs run pe False).
    use_pe = bool(fw_cfg.get("pe", {}).get("use", False))
    ref: dict = {"data": {
        "dataset_name": fw_cfg["data"]["dataset_name"],
        "batch_size": fw_cfg["data"].get("batch_size", 32),
        "num_workers": 0,
        "pe": use_pe,
    }}
    if model == "hscn":
        src = fw_cfg["hscn"]
        ref["hscn"] = {k: src[k] for k in REF_HSCN_KEYS if k in src}
    else:
        src = fw_cfg["mp"]
        ref["mp"] = {k: src[k] for k in REF_MP_KEYS if k in src}
    src = fw_cfg["optim"]
    ref["optim"] = {k: src[k] for k in REF_OPTIM_KEYS if k in src}
    if use_pe:
        src = fw_cfg["pe"]
        ref["pe"] = {"use": True}
        ref["pe"].update({k: src[k] for k in REF_PE_KEYS if k in src})
    else:
        ref["pe"] = {"use": False}
    src = fw_cfg["training"]
    ref["training"] = {k: src[k] for k in REF_TRAIN_KEYS if k in src}
    ref["training"]["use_wandb"] = True  # mandatory (quirk #3); shim no-ops
    ref["training"]["epochs"] = int(
        ref_epochs or fw_cfg["training"].get("max_epochs", 500))
    return ref


def run_reference_shim(dataset: str, npz_path: Path, ref_cfg: dict,
                       reference_dir: str, workdir: Path, seed: int | None,
                       timeout: int) -> str:
    """Execute the mounted reference against the shared synthetic data."""
    import yaml
    ref_root = workdir / "reference_run"
    if not ref_root.exists():
        log(f"copying {reference_dir} -> {ref_root} (writable run dir)")
        shutil.copytree(reference_dir, ref_root)
        for p in ref_root.rglob("*"):
            os.chmod(p, os.stat(p).st_mode | 0o200)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    env["PYTHONPATH"] = f"{SHIM_DIR}:{ref_root}"
    if seed is not None:
        env["PARITY_TORCH_SEED"] = str(seed)
    run_and_capture(
        [sys.executable, SHIM_DIR / "seed_reference_data.py",
         "--npz", npz_path, "--dataset", dataset, "--ref-root", ref_root],
        env=env, timeout=600)
    cfg_path = ref_root / "configs" / "parity.yaml"
    cfg_path.write_text(yaml.safe_dump(ref_cfg))
    return run_and_capture(
        [sys.executable, SHIM_DIR / "run_reference.py", "--cfg", cfg_path],
        cwd=ref_root, env=env, timeout=timeout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["shim", "cli"], default="shim")
    ap.add_argument("--dataset", default="peptides_func")
    ap.add_argument("--model", default="gcn",
                    choices=["gcn", "gat", "hscn", "gcn_pe"])
    ap.add_argument("--num-graphs", type=int, default=512,
                    help="synthetic dataset size (shim mode)")
    ap.add_argument("--data-seed", type=int, default=0)
    ap.add_argument("--ref-seed", type=int, default=None,
                    help="torch.manual_seed for the reference process "
                         "(default: unseeded, faithful to the reference)")
    ap.add_argument("--ref-epochs", type=int, default=None,
                    help="override the reference epoch count (quick runs); "
                         "default follows the framework config's max_epochs")
    ap.add_argument("--fw-epochs", type=int, default=None,
                    help="override the framework max_epochs (quick runs)")
    ap.add_argument("--ref-seeds", default=None,
                    help="comma list: run the reference once per seed and "
                         "report the seed study (the reference's own "
                         "seed-to-seed test-AP spread is ~5x the 0.005 "
                         "gate on this task, so single-run deltas cannot "
                         "resolve the gate; the delta of means can)")
    ap.add_argument("--fw-seeds", default=None,
                    help="comma list: run the framework once per "
                         "training.seed")
    ap.add_argument("--fw-true-split-seeds", default=None,
                    help="hscn only: extra framework runs on the TRUE "
                         "splits (recorded for transparency, not a "
                         "parity comparison — quirk #16); default: the "
                         "first --fw-seeds seed")
    ap.add_argument("--reference-dir", default="/root/reference")
    ap.add_argument("--reference-python", default=sys.executable)
    ap.add_argument("--reference-cfg", default=None,
                    help="cli mode: reference YAML path")
    ap.add_argument("--framework-cfg", default=None,
                    help="default: FRAMEWORK_CFGS[(dataset, model)]")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default="PARITY_RESULT.json")
    ap.add_argument("--gate", type=float, default=GATE)
    ap.add_argument("--skip-convert", action="store_true")
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse --reference-log instead of running it")
    ap.add_argument("--reference-log", default=None)
    ap.add_argument("--reuse-ref-artifact", default=None,
                    help="path to a prior parity artifact whose "
                         "reference_seed_runs are reused verbatim "
                         "(valid only when data/model/epochs are "
                         "identical — e.g. the compat-faithful HSCN "
                         "study reuses the quirk-fixed study's "
                         "reference side, which is the same program "
                         "on the same data)")
    ap.add_argument("--reference-cmd", default=None,
                    help="override the reference invocation entirely")
    ap.add_argument("--timeout", type=int, default=6 * 3600)
    ap.add_argument("--dry-run", action="store_true",
                    help="stubbed reference + tiny framework run; "
                         "validates the orchestration only")
    args = ap.parse_args()

    import yaml

    workdir = Path(tempfile.mkdtemp(prefix="parity_"))
    data_dir = Path(args.data_dir) if args.data_dir else workdir / "data"
    fw_cfg_default = FRAMEWORK_CFGS.get((args.dataset, args.model))
    fw_cfg_path = Path(args.framework_cfg) if args.framework_cfg else (
        REPO / fw_cfg_default if fw_cfg_default else None)
    if fw_cfg_path is None or not fw_cfg_path.exists():
        raise SystemExit(f"no framework config for "
                         f"({args.dataset}, {args.model}); pass "
                         "--framework-cfg")
    fw_cfg = yaml.safe_load(fw_cfg_path.read_text())

    result = {
        "dataset": args.dataset,
        "model": args.model,
        "gate": args.gate,
        "dry_run": bool(args.dry_run),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "phases": {},
    }

    # ---- Phase 1: shared data. ----
    npz_path = data_dir / f"{args.dataset}.npz"
    if args.dry_run:
        log("data: skipped (dry run: synthetic generator in-process)")
        result["phases"]["data"] = "skipped"
    elif npz_path.exists():
        log(f"data: reusing {npz_path}")
        result["phases"]["data"] = f"reused:{npz_path}"
    elif args.mode == "cli" and not args.skip_convert:
        run_and_capture(
            [sys.executable, REPO / "scripts" / "convert_lrgb.py",
             "--dataset", args.dataset, "--out", data_dir],
            timeout=args.timeout)
        result["phases"]["data"] = f"converted:{data_dir}"
    else:
        run_and_capture(
            [sys.executable, REPO / "scripts" / "export_synthetic_npz.py",
             "--dataset", args.dataset, "--num-graphs", args.num_graphs,
             "--seed", args.data_seed, "--out", data_dir],
            timeout=1200)
        result["phases"]["data"] = (
            f"synthetic:{npz_path}:n={args.num_graphs}:seed={args.data_seed}")

    # ---- Phase 2: reference train. ----
    if args.skip_reference:
        if not args.reference_log:
            raise SystemExit("--skip-reference requires --reference-log "
                             "(a prior run's captured output to parse)")
        ref_text = Path(args.reference_log).read_text()
        result["phases"]["reference"] = f"log:{args.reference_log}"
    elif args.reference_cmd:
        ref_text = run_and_capture(["bash", "-c", args.reference_cmd],
                                   timeout=args.timeout)
        result["phases"]["reference"] = "cmd"
    elif args.dry_run:
        # Stub: fixed eval lines in the reference's exact logger format.
        ref_text = ("Validation -- Loss: 0.5000, AP: 0.4500\n"
                    "Test -- Loss: 0.5100, AP: 0.4400\n"
                    "Validation -- Loss: 0.4000, AP: 0.5500\n"
                    "Test -- Loss: 0.4100, AP: 0.5400\n")
        result["phases"]["reference"] = "stub"
    elif args.reuse_ref_artifact:
        prior = json.loads(Path(args.reuse_ref_artifact).read_text())
        if "reference_seed_runs" not in prior:
            raise SystemExit(f"{args.reuse_ref_artifact} has no "
                             "reference_seed_runs to reuse")
        # The reuse is only valid on identical data: compare the
        # dataset/n/seed fields of the data provenance strings (paths
        # are per-run temp dirs and expected to differ).
        def _data_key(s):
            return (re.search(r"([^/]+)\.npz", s or "").group(1)
                    if re.search(r"([^/]+)\.npz", s or "") else None,
                    *(re.findall(r":(n=\d+|seed=\d+)", s or "")))
        prior_data = prior.get("provenance", {}).get("data", "")
        if _data_key(prior_data) != _data_key(result["phases"]["data"]):
            raise SystemExit(
                f"--reuse-ref-artifact data mismatch: prior ran on "
                f"{prior_data!r}, this run on "
                f"{result['phases']['data']!r}")
        result["reference_seed_runs"] = prior["reference_seed_runs"]
        result["phases"]["reference"] = (
            f"reused:{args.reuse_ref_artifact}")
        prov = dict(prior.get("provenance", {}))
        prov["amendments"] = list(prov.get("amendments", [])) + [
            f"reference seed runs reused from {args.reuse_ref_artifact} "
            "(same reference program on byte-identical data; only the "
            "framework side differs between the two studies)"]
        result["provenance"] = prov
        r0 = prior["reference_seed_runs"][0]
        ref_text = None
        ref_val, ref_metric = r0["best_val_loss"], r0["test_metric"]
    elif args.mode == "shim":
        ref_cfg = synthesize_reference_cfg(fw_cfg, args.model,
                                           args.ref_epochs)
        if args.ref_seeds:
            ref_runs = []
            first_text = None
            for s in [int(v) for v in args.ref_seeds.split(",")]:
                try:
                    txt = run_reference_shim(
                        args.dataset, npz_path, ref_cfg, args.reference_dir,
                        workdir, s, args.timeout)
                except (RuntimeError, subprocess.TimeoutExpired) as e:
                    log(f"reference seed {s}: FAILED ({e}) — excluded "
                        "from the seed study")
                    continue
                v, m = best_val_test_metric(txt)
                log(f"reference seed {s}: test_metric={m}")
                if m is None:
                    # A diverged/unparseable run must not poison the
                    # study's means hours later.
                    log(f"reference seed {s}: UNPARSEABLE eval output — "
                        "excluded from the seed study")
                    continue
                if first_text is None:
                    first_text = txt
                ref_runs.append({"seed": s, "best_val_loss": v,
                                 "test_metric": m})
            if not ref_runs:
                raise SystemExit("no reference seed produced parseable "
                                 "eval output")
            # The headline single-run block pairs the FIRST parseable
            # runs of each side (matched seeds when both lists start
            # equal), consistent with the per-seed arrays.
            ref_text = first_text
            result["reference_seed_runs"] = ref_runs
        else:
            ref_text = run_reference_shim(
                args.dataset, npz_path, ref_cfg, args.reference_dir,
                workdir, args.ref_seed, args.timeout)
        result["phases"]["reference"] = "executed-shim"
        result["provenance"] = {
            "reference_code": "executed (mounted tree, byte-unmodified, "
                              "on pure-torch shims of its PyG/OGB/wandb "
                              "deps: scripts/ref_shim/)",
            "data": result["phases"]["data"],
            "amendments": (
                ["HSCNConfig.mp_units declared by the run wrapper (the "
                 "reference's main.py:102 reads it but its schema omits "
                 "it)"] +
                (["ACT_DICT['activation'] -> F.relu added by the run "
                  "wrapper so the SignNet MLP's broken lookup "
                  "(signnet.py:49, quirk #5) resolves to the relu the "
                  "call sites request",
                  "compute_posenc loaders rebuilt per-graph by the run "
                  "wrapper (the committed code batches Batch objects "
                  "into loaders of batches-of-batches, a path that "
                  "never executed; see run_reference.py)"]
                 if ref_cfg["data"]["pe"] else
                 ["data.pe=False on both sides (this pair runs without "
                  "the PE subsystem; the gcn_pe pair exercises it)"])),
            "ref_seed": args.ref_seed,
            "ref_epochs": args.ref_epochs,
        }
    else:
        ref_cfg_path = args.reference_cfg or str(
            Path(args.reference_dir) / "configs" / "GCN" /
            f"{args.dataset}_GCN.yaml")
        ref_text = run_and_capture(
            [args.reference_python, "main.py", "--cfg", ref_cfg_path],
            cwd=args.reference_dir, timeout=args.timeout)
        result["phases"]["reference"] = ref_cfg_path
    if ref_text is not None:
        ref_val, ref_metric = best_val_test_metric(ref_text)
    if ref_metric is None:
        raise SystemExit("could not parse reference eval lines")

    # ---- Phase 3: framework train. ----
    base = dict(fw_cfg)
    if args.dry_run:
        base.setdefault("data", {})
        base["data"]["num_graphs"] = 64
        base["training"]["max_epochs"] = 4
        base["training"]["eval_period"] = 2
        base["training"]["patience"] = 50
    else:
        if not npz_path.exists():
            raise SystemExit(
                f"no data cache at {npz_path} — a parity verdict needs "
                "both sides on identical data")
        base["data"]["data_dir"] = str(data_dir)
        if args.fw_epochs:
            base["training"]["max_epochs"] = args.fw_epochs

    # HSCN apples-to-apples data: the reference's hetero loaders train and
    # evaluate on a deterministic scramble of the partition (quirk #16),
    # so the framework's comparable runs use the derived EFFECTIVE splits;
    # a true-splits run is recorded alongside for completeness.
    fw_data_dir = None
    if args.model == "hscn" and not args.dry_run:
        eff_path = write_effective_splits_npz(
            npz_path, workdir / "data_effective")
        fw_data_dir = str(eff_path.parent)
        result["effective_splits"] = {
            "npz": str(eff_path),
            "derivation": "order=concat(train,val,test) split indices; "
                          "effective[k]=order[split[k]] (reference "
                          "hetero_data.py:34-42 position order vs :97-99 "
                          "original-id indexing — SURVEY.md quirk #16)",
        }

    def run_framework_once(seed=None, data_dir_override=None, tag=""):
        cfg = dict(base)
        if data_dir_override is not None:
            cfg["data"] = dict(cfg["data"], data_dir=data_dir_override)
        if seed is not None:
            cfg["training"] = dict(cfg["training"], seed=seed)
        run_cfg_path = workdir / f"framework_cfg{tag}_{seed}.yaml"
        run_cfg_path.write_text(yaml.safe_dump(cfg))
        txt = run_and_capture(
            [sys.executable, REPO / "main.py", "--cfg", run_cfg_path],
            cwd=REPO, timeout=args.timeout)
        return best_val_test_metric(txt)

    def run_framework_seeds(seeds, data_dir_override=None, tag=""):
        runs = []
        for s in seeds:
            try:
                v, m = run_framework_once(s, data_dir_override, tag)
            except (RuntimeError, subprocess.TimeoutExpired) as e:
                log(f"framework{tag} seed {s}: FAILED ({e}) — excluded "
                    "from the seed study")
                continue
            log(f"framework{tag} seed {s}: test_metric={m}")
            if m is None:
                log(f"framework{tag} seed {s}: UNPARSEABLE eval output — "
                    "excluded from the seed study")
                continue
            runs.append({"seed": s, "best_val_loss": v, "test_metric": m})
        return runs

    if args.fw_seeds and not args.dry_run:
        seeds = [int(v) for v in args.fw_seeds.split(",")]
        fw_runs = run_framework_seeds(seeds, fw_data_dir)
        if not fw_runs:
            raise SystemExit("no framework seed produced parseable "
                             "eval output")
        result["framework_seed_runs"] = fw_runs
        fw_val, fw_metric = fw_runs[0]["best_val_loss"], \
            fw_runs[0]["test_metric"]
        if fw_data_dir is not None:
            # One true-splits run per requested seed (default: first seed
            # only) — NOT comparable to the reference (different test
            # subset), recorded for transparency.
            ts = ([int(v) for v in args.fw_true_split_seeds.split(",")]
                  if args.fw_true_split_seeds else seeds[:1])
            result["framework_true_split_runs"] = run_framework_seeds(
                ts, None, tag="_true_splits")
            result["framework_true_split_note"] = (
                "true-splits runs evaluate a DIFFERENT test subset than "
                "the reference does (quirk #16); they are not a parity "
                "comparison")
    else:
        fw_val, fw_metric = run_framework_once(
            data_dir_override=fw_data_dir)
    result["phases"]["framework"] = str(fw_cfg_path)
    if fw_metric is None:
        raise SystemExit("could not parse framework eval lines")

    # ---- Phase 4: verdict. ----
    delta = abs(fw_metric - ref_metric)
    result.update({
        "reference": {"best_val_loss": ref_val, "test_metric": ref_metric},
        "framework": {"best_val_loss": fw_val, "test_metric": fw_metric},
        "delta": delta,
        # The gate is meaningful when the reference actually executed and
        # both sides trained to completion on shared data.
        "pass": (None if args.dry_run else bool(delta <= args.gate)),
    })
    if "reference_seed_runs" in result and "framework_seed_runs" in result:
        rv = [r["test_metric"] for r in result["reference_seed_runs"]]
        fv = [r["test_metric"] for r in result["framework_seed_runs"]]
        metric_name = str(fw_cfg["training"].get("metric", "ap")).lower()
        result["seed_study"] = seed_study_stats(
            rv, fv, args.gate, higher_is_better=(metric_name != "mae"))
        # With a seed study present, the headline verdict is the
        # statistically meaningful one.
        result["pass_single_run"] = result["pass"]
        result["pass"] = result["seed_study"]["pass"]
        ss = result["seed_study"]
        hw = ss["ci95_halfwidth"]
        log(f"seed study: ref mean {np.mean(rv):.4f} (n={len(rv)}), "
            f"fw mean {np.mean(fv):.4f} (n={len(fv)}), "
            f"delta_of_means={ss['delta_of_means']:.4f} "
            f"+/- {hw if hw is None else round(hw, 4)} (95% CI); "
            f"{'resolves' if ss['resolves_gate'] else 'does NOT resolve'} "
            f"the {args.gate} gate")
    Path(args.out).write_text(json.dumps(result, indent=2))
    log(f"wrote {args.out}: delta={delta:.4f} "
        f"gate={'n/a (dry run)' if args.dry_run else args.gate}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
