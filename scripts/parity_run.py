"""Turnkey real-data parity run: convert -> reference train -> framework
train -> AP-delta verdict (VERDICT round-2 item 6 / BASELINE.json gate).

On a networked machine with RDKit + torch_geometric installed:

    python scripts/parity_run.py \
        --dataset peptides_func \
        --reference-dir /root/reference \
        --data-dir /tmp/lrgb_cache \
        --out PARITY_RESULT.json

Phases (each skippable / overridable):
  1. convert    scripts/convert_lrgb.py --dataset <ds> --out <data-dir>
                (downloads the LRGB CSV, RDKit smiles2graph, caches .npz —
                reference peptides_functional.py:63-106 semantics).
  2. reference  runs the MOUNTED reference CLI (`python main.py --cfg
                configs/GCN/peptides_func_GCN.yaml` in --reference-dir),
                parses its CustomLogger eval lines (logger.py:38-42
                "Validation -- Loss: x, AP: y" / "Test -- ...").
  3. framework  runs this repo's CLI with the matching config, pointing
                data.data_dir at the converted cache.
  4. verdict    test-AP at each side's best-val-loss eval, |delta| vs the
                0.005 gate -> PARITY_RESULT.json (machine-readable).

--dry-run exercises the full orchestration without network/RDKit: the
framework trains on the synthetic generator and the reference phase is a
stub emitting fixed eval lines; the emitted JSON carries "dry_run": true.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
GATE = 0.005

EVAL_RE = re.compile(
    r"(Validation|Test)\s*--\s*Loss:\s*([-\d.na]+),\s*(?:AP|MAE|F1):\s*"
    r"([-\d.na]+)")


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="peptides_func")
    ap.add_argument("--reference-dir", default="/root/reference")
    ap.add_argument("--reference-python", default=sys.executable)
    ap.add_argument("--reference-cfg", default=None,
                    help="default: configs/GCN/<dataset>_GCN.yaml in the "
                         "reference tree")
    ap.add_argument("--framework-cfg", default=None,
                    help="default: configs/GCN/<dataset>_GCN.yaml here, "
                         "with data.data_dir injected")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default="PARITY_RESULT.json")
    ap.add_argument("--gate", type=float, default=GATE)
    ap.add_argument("--skip-convert", action="store_true")
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse --reference-log instead of running it")
    ap.add_argument("--reference-log", default=None)
    ap.add_argument("--reference-cmd", default=None,
                    help="override the reference invocation (used by the "
                         "dry-run test to stub it)")
    ap.add_argument("--timeout", type=int, default=6 * 3600)
    ap.add_argument("--dry-run", action="store_true",
                    help="no network/RDKit: synthetic data + stubbed "
                         "reference; validates the orchestration")
    args = ap.parse_args()

    data_dir = Path(args.data_dir or tempfile.mkdtemp(prefix="lrgb_"))
    result = {
        "dataset": args.dataset,
        "gate": args.gate,
        "dry_run": bool(args.dry_run),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "phases": {},
    }

    # ---- Phase 1: convert. ----
    if args.dry_run or args.skip_convert:
        log("convert: skipped"
            + (" (dry run: synthetic generator)" if args.dry_run else ""))
        result["phases"]["convert"] = "skipped"
    else:
        run_and_capture(
            [sys.executable, REPO / "scripts" / "convert_lrgb.py",
             "--dataset", args.dataset, "--out", data_dir],
            timeout=args.timeout)
        result["phases"]["convert"] = str(data_dir)

    # ---- Phase 2: reference train. ----
    cfg_name = {"peptides_func": "peptides_func_GCN.yaml",
                "peptides_struct": "peptides_struct_GCN.yaml"}.get(
        args.dataset, f"{args.dataset}_GCN.yaml")
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
    else:
        ref_cfg = args.reference_cfg or str(
            Path(args.reference_dir) / "configs" / "GCN" / cfg_name)
        ref_text = run_and_capture(
            [args.reference_python, "main.py", "--cfg", ref_cfg],
            cwd=args.reference_dir, timeout=args.timeout)
        result["phases"]["reference"] = ref_cfg
    ref_val, ref_metric = best_val_test_metric(ref_text)
    if ref_metric is None:
        raise SystemExit("could not parse reference eval lines")

    # ---- Phase 3: framework train. ----
    if args.framework_cfg:
        fw_cfg_path = Path(args.framework_cfg)
    else:
        import yaml
        base = yaml.safe_load(
            (REPO / "configs" / "GCN" / cfg_name).read_text())
        if args.dry_run:
            base["data"]["num_graphs"] = 64
            base["training"]["max_epochs"] = 4
            base["training"]["eval_period"] = 2
            base["training"]["patience"] = 50
        else:
            cache = data_dir / f"{args.dataset}.npz"
            if not cache.exists():
                raise SystemExit(
                    f"no converted cache at {cache} — a real parity "
                    "verdict must not train on synthetic data (pass "
                    "--data-dir of a populated cache, or drop "
                    "--skip-convert).  DataModule also refuses a bad "
                    "data_dir, but failing here is clearer.")
            base["data"]["data_dir"] = str(data_dir)
        fd, tmp_name = tempfile.mkstemp(suffix=".yaml")
        import os
        os.close(fd)
        fw_cfg_path = Path(tmp_name)
        fw_cfg_path.write_text(yaml.safe_dump(base))
    fw_text = run_and_capture(
        [sys.executable, REPO / "main.py", "--cfg", fw_cfg_path],
        cwd=REPO, timeout=args.timeout)
    result["phases"]["framework"] = str(fw_cfg_path)
    fw_val, fw_metric = best_val_test_metric(fw_text)
    if fw_metric is None:
        raise SystemExit("could not parse framework eval lines")

    # ---- Phase 4: verdict. ----
    delta = abs(fw_metric - ref_metric)
    result.update({
        "reference": {"best_val_loss": ref_val, "test_metric": ref_metric},
        "framework": {"best_val_loss": fw_val, "test_metric": fw_metric},
        "delta": delta,
        # The gate is only meaningful on REAL data with both sides
        # trained to completion; a dry run validates plumbing, not parity.
        "pass": (None if args.dry_run else bool(delta <= args.gate)),
    })
    Path(args.out).write_text(json.dumps(result, indent=2))
    log(f"wrote {args.out}: delta={delta:.4f} "
        f"gate={'n/a (dry run)' if args.dry_run else args.gate}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
