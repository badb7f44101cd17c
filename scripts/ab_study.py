"""Generic framework A/B seed study: train two config variants over
matched seeds on the same synthetic data and report the delta of seed
means with SE and a Welch 95% CI (the parity-matrix statistics).

Arms are YAML override dicts applied on top of a base config, so the
study isolates exactly one knob, e.g.

    python scripts/ab_study.py \
        --base configs/GCN/peptides_func_GCN.yaml \
        --arm-a '{"runtime": {"fused_stack": "off"}}' \
        --arm-b '{"runtime": {"fused_stack": "on"}}' \
        --seeds 100..123 --out artifacts/AB_FUSED_R5.json

Used in round 5 to resolve whether the fused Pallas GCN stack trains to
a different AP distribution than the unfused XLA path (the two 24-seed
parity studies differed by ~0.01 with overlapping CIs).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from parity_run import best_val_test_metric, seed_study_stats  # noqa: E402


def deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def parse_seeds(spec: str) -> list:
    if ".." in spec:
        lo, hi = spec.split("..")
        return list(range(int(lo), int(hi) + 1))
    return [int(s) for s in spec.split(",")]


def run_once(cfg: dict, seed: int, tag: str, workdir: Path,
             timeout: int):
    import yaml
    cfg = json.loads(json.dumps(cfg))
    cfg.setdefault("training", {})["seed"] = seed
    p = workdir / f"cfg_{tag}_{seed}.yaml"
    p.write_text(yaml.safe_dump(cfg))
    proc = subprocess.run(
        [sys.executable, str(REPO / "main.py"), "--cfg", str(p)],
        capture_output=True, text=True, cwd=REPO, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-1500:])
    return best_val_test_metric(proc.stdout + proc.stderr)


def main():
    import yaml
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--arm-a", required=True,
                    help="JSON override dict for arm A")
    ap.add_argument("--arm-b", required=True,
                    help="JSON override dict for arm B")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--seeds", default="0..7",
                    help="comma list or lo..hi inclusive range")
    ap.add_argument("--num-graphs", type=int, default=None)
    ap.add_argument("--higher-is-better", default="true")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    base = yaml.safe_load((REPO / args.base).read_text())
    if args.num_graphs:
        base.setdefault("data", {})["num_graphs"] = args.num_graphs
    arms = {
        args.label_a: deep_update(json.loads(json.dumps(base)),
                                  json.loads(args.arm_a)),
        args.label_b: deep_update(json.loads(json.dumps(base)),
                                  json.loads(args.arm_b)),
    }
    workdir = Path(tempfile.mkdtemp(prefix="ab_study_"))
    seeds = parse_seeds(args.seeds)

    runs = {k: [] for k in arms}
    for seed in seeds:
        for label, cfg in arms.items():
            try:
                val, metric = run_once(cfg, seed, label, workdir,
                                       args.timeout)
            except (RuntimeError, subprocess.TimeoutExpired) as e:
                print(f"[ab] {label} seed {seed}: FAILED ({e}) — excluded",
                      file=sys.stderr)
                continue
            print(f"[ab] {label} seed {seed}: {metric}", file=sys.stderr)
            if metric is not None:
                runs[label].append({"seed": seed, "best_val_loss": val,
                                    "test_metric": metric})

    a = [r["test_metric"] for r in runs[args.label_a]]
    b = [r["test_metric"] for r in runs[args.label_b]]
    hib = args.higher_is_better.lower() in ("1", "true", "yes")
    # seed_study_stats treats the first list as "reference": arm A is
    # the baseline, so delta_of_means_signed > 0 means arm B higher.
    stats = seed_study_stats(a, b, 0.005, higher_is_better=hib)
    out = {
        "base": args.base,
        "arms": {args.label_a: json.loads(args.arm_a),
                 args.label_b: json.loads(args.arm_b)},
        "seeds": seeds,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "runs": runs,
        "stats": stats,
        "reading": (f"delta_of_means_signed = mean({args.label_b}) - "
                    f"mean({args.label_a})"),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    hw = stats["ci95_halfwidth"]
    print(f"[ab] wrote {args.out}: {args.label_b}-minus-{args.label_a} "
          f"{stats['delta_of_means_signed']:+.4f} "
          f"+/- {hw if hw is None else round(hw, 4)} (95% CI)",
          file=sys.stderr)
    print(json.dumps({"delta": stats["delta_of_means_signed"],
                      "ci95_halfwidth": hw}))


if __name__ == "__main__":
    main()
