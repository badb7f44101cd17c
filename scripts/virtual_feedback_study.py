"""A/B seed study for ``hscn.virtual_feedback`` (quirk #17 extension).

The reference's HSCN virtual pathway is output-inert (no v->l relation,
local-only readout — proven by execution in
tests/test_ref_shim.py::test_reference_virtual_pathway_inert), so the
shipped architecture cannot benefit from its own hierarchy.  This study
trains the framework's HSCN with feedback OFF (reference-faithful) and
ON (the missing hierarchical channel) over matched seeds on the same
synthetic peptides data and reports the delta of seed means with SE and
a Welch CI (same statistics as the parity matrix).

Usage: python scripts/virtual_feedback_study.py \
           [--seeds 0,1,2,3,4,5] [--num-graphs 256] \
           [--out artifacts/VFB_STUDY_R5.json]
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


def run_arm(cfg_base: dict, seed: int, feedback: bool, workdir: Path,
            timeout: int) -> tuple:
    import yaml
    cfg = json.loads(json.dumps(cfg_base))     # deep copy
    cfg["training"]["seed"] = seed
    if feedback:
        cfg.setdefault("hscn", {})["virtual_feedback"] = True
    p = workdir / f"cfg_{'fb' if feedback else 'base'}_{seed}.yaml"
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
    ap.add_argument("--seeds", default="0,1,2,3,4,5")
    ap.add_argument("--num-graphs", type=int, default=256)
    ap.add_argument("--cfg", default="configs/HSCN/peptides_func_HSCN.yaml")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default="artifacts/VFB_STUDY_R5.json")
    args = ap.parse_args()

    cfg_base = yaml.safe_load((REPO / args.cfg).read_text())
    cfg_base.setdefault("data", {})["num_graphs"] = args.num_graphs
    workdir = Path(tempfile.mkdtemp(prefix="vfb_study_"))
    seeds = [int(s) for s in args.seeds.split(",")]

    runs = {"base": [], "feedback": []}
    for seed in seeds:
        for arm, fb in (("base", False), ("feedback", True)):
            try:
                val, metric = run_arm(cfg_base, seed, fb, workdir,
                                      args.timeout)
            except (RuntimeError, subprocess.TimeoutExpired) as e:
                print(f"[vfb] {arm} seed {seed}: FAILED ({e}) — excluded",
                      file=sys.stderr)
                continue
            print(f"[vfb] {arm} seed {seed}: test AP {metric}",
                  file=sys.stderr)
            if metric is not None:
                runs[arm].append({"seed": seed, "best_val_loss": val,
                                  "test_metric": metric})

    base_v = [r["test_metric"] for r in runs["base"]]
    fb_v = [r["test_metric"] for r in runs["feedback"]]
    # "reference" slot = feedback-off arm; framework_advantage > 0 means
    # the feedback channel helps.
    stats = seed_study_stats(base_v, fb_v, 0.005, higher_is_better=True)
    out = {
        "study": "hscn.virtual_feedback A/B (quirk #17 extension)",
        "data": f"synthetic peptides_func, {args.num_graphs} graphs",
        "config": args.cfg,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "arms": {"base (feedback off, reference-faithful)": runs["base"],
                 "feedback (v->l per layer)": runs["feedback"]},
        "stats": stats,
        "note": ("both arms share data, splits, and per-seed init "
                 "streams for every other module; the only difference "
                 "is the v->l projection (plus its params)"),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    hw = stats["ci95_halfwidth"]
    print(f"[vfb] wrote {args.out}: feedback-minus-base delta "
          f"{stats['delta_of_means_signed']:+.4f} "
          f"+/- {hw if hw is None else round(hw, 4)} (95% CI)",
          file=sys.stderr)
    print(json.dumps({"delta": stats["delta_of_means_signed"],
                      "ci95_halfwidth": hw}))


if __name__ == "__main__":
    main()
