"""Assemble PARITY_MATRIX.json from executed seed-study artifacts.

Every entry carries {n, mean, std, values} per side plus the
delta-of-means with SE and a Welch 95% CI, and an explicit
``resolves_gate`` statement (round-4 verdict item 2: no PASS whose CI
spans the gate without saying so).

Inputs: artifacts/PARITY_*.json written by scripts/parity_run.py
(--ref-seeds/--fw-seeds studies).  Extension artifacts (e.g. HSCN seeds
8-23) are merged with their base study by key.

Usage:  python scripts/build_parity_matrix.py [--out PARITY_MATRIX.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from parity_run import seed_study_stats  # noqa: E402

GATE = 0.005

# (matrix key, metric, higher_is_better, [artifact files merged in
#  order], scope note)
ENTRIES = [
    ("peptides_func/gcn", "test AP", True,
     ["PARITY_GCN_NOFUSED_R5.json", "PARITY_GCN_NOFUSED_R5_EXT.json?",
      "PARITY_GCN_NOFUSED_R5_EXT2.json?"],
     "512 graphs, SHIPPED default path for this "
     "accuracy-pinned config (matmul_precision: highest routes "
     "fused_stack auto to the unfused XLA stack; runner._use_fused_stack)"
     ".  The fused-kernel studies that motivated that routing are kept "
     "as evidence: PARITY_GCN_R5.json (fused pre precision-fix, delta "
     "-0.0171) and PARITY_GCN_FUSEDFIX_R5.json (fused post-fix, "
     "-0.0169) — both ~0.010 below this arm, not resolvable at "
     "affordable n with per-op-exact kernels (BASELINE.md round-5)"),
    ("peptides_func/gat", "test AP", True,
     ["PARITY_GAT_R4.json", "PARITY_GAT_R5_EXT.json?",
      "PARITY_GAT_R5_EXT2.json?", "PARITY_GAT_R5_EXT3.json?"],
     "512 graphs; SCOPE: heads=1 both sides — the only GAT "
     "the reference can express (PyG default); the multi-head kernels "
     "rest on unit tests (tests/test_multihead_kernel.py, "
     "test_sharded_gat.py), not an executed-reference comparison"),
    ("peptides_struct/gcn", "test MAE", False,
     ["PARITY_STRUCT_XLA_R5.json", "PARITY_STRUCT_XLA_R5_EXT.json",
      "PARITY_STRUCT_XLA_R5_EXT2.json?"],
     "256 graphs on the accuracy-pinned path "
     "(matmul_precision: highest -> unfused XLA stack).  MAE is "
     "low-variance for most seeds, but the framework's seed draw has "
     "occasional high-MAE tail events (1/16 here at 0.959; the earlier "
     "fused-path studies PARITY_STRUCT_R5{,_EXT}.json drew 3/16 up to "
     "0.987 — normal val loss, elevated sigmoid-MAE, quirk #10 "
     "scoring); tail seeds are kept, not trimmed"),
    ("peptides_func/hscn", "test AP", True,
     ["PARITY_HSCN_R5.json", "PARITY_HSCN_R5_EXT.json?",
      "PARITY_HSCN_R5_EXT2.json?", "PARITY_HSCN_R5_EXT3.json?",
      "PARITY_HSCN_R5_EXT4.json?", "PARITY_HSCN_R5_EXT5.json?",
      "PARITY_HSCN_R5_EXT6.json?", "PARITY_HSCN_R5_EXT7.json?"],
     "turnkey `make parity MODEL=hscn`: framework trained/evaluated on "
     "the reference's EFFECTIVE (scrambled) splits derived automatically "
     "from the npz split indices (quirk #16); true-splits run recorded "
     "in the artifact.  Quirk #8 (virtual-feature rotation) needs no "
     "compat treatment here: the reference's virtual pathway is "
     "OUTPUT-INERT (quirk #17, proven by execution), and the committed "
     "compat-faithful study PARITY_HSCN_COMPAT_R5.json reproduces these "
     "per-seed APs bit-identically"),
    ("peptides_func/gcn+signnet_pe", "test AP", True,
     ["PARITY_GCN_PE_XLA_R5.json", "PARITY_GCN_PE_XLA_R5_EXT.json",
      "PARITY_GCN_PE_XLA_R5_EXT2.json?",
      "PARITY_GCN_PE_XLA_R5_EXT3.json?"],
     "512 graphs with the SignNet PE subsystem ON on "
     "both sides (reference PE path executed under the documented "
     "ACT_DICT amendment, quirk #5; frozen-random encoder per quirk #6 "
     "with the torch init family on the framework side), framework on "
     "the accuracy-pinned unfused path; the fused-path blocks "
     "PARITY_GCN_PE_R5B{,_EXT}.json are kept as evidence"),
]


def load_runs(files):
    """A trailing '?' marks an artifact as optional (e.g. an extension
    study merged with its base when present)."""
    ref, fw, provenance = [], [], None
    for f in files:
        optional = f.endswith("?")
        f = f.rstrip("?")
        p = REPO / "artifacts" / f
        if not p.exists():
            if optional:
                print(f"[matrix] optional artifact {f} absent — base "
                      "study only", file=sys.stderr)
                continue
            return None, None, None, f
        d = json.loads(p.read_text())
        ref += [r["test_metric"] for r in d.get("reference_seed_runs", [])]
        fw += [r["test_metric"] for r in d.get("framework_seed_runs", [])]
        provenance = d.get("provenance", provenance)
    return ref, fw, provenance, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "PARITY_MATRIX.json"))
    args = ap.parse_args()
    matrix = {
        "provenance": (
            "every reference number comes from EXECUTING the mounted "
            "reference in-image (scripts/ref_shim/); both sides train on "
            "byte-identical synthetic data with full 500-epoch + "
            "early-stop semantics; per-entry studies regenerable via "
            "`make parity MODEL=...` / scripts/parity_run.py"),
        "gate": GATE,
        "statistics": (
            "delta_of_means (|framework - reference|) with SE and Welch "
            "95% CI; `resolves_gate` says whether the study's CI "
            "half-width is within the gate — where it is not, the "
            "verdict states what gap the study can exclude instead of "
            "claiming a resolved PASS.  The gate is SYMMETRIC parity; "
            "the build goal is match-or-beat, so `verdict` also "
            "classifies the direction: framework_better means the "
            "framework mean sits on the better side of the metric "
            "(`meets_or_beats` true)"),
        "entries": {},
    }
    for key, metric, hib, files, note in ENTRIES:
        ref, fw, prov, missing = load_runs(files)
        if missing:
            print(f"[matrix] {key}: missing artifact {missing} — skipped",
                  file=sys.stderr)
            continue
        stats = seed_study_stats(ref, fw, GATE, higher_is_better=hib)
        entry = {
            "metric": metric,
            "reference": dict(stats["reference"], values=ref),
            "framework": dict(stats["framework"], values=fw),
            "delta_of_means": stats["delta_of_means"],
            "delta_of_means_signed": stats["delta_of_means_signed"],
            "se_delta": stats["se_delta"],
            "ci95_delta": stats["ci95_delta"],
            "ci95_halfwidth": stats["ci95_halfwidth"],
            "pass": stats["pass"],
            "direction": stats["direction"],
            "framework_advantage": stats["framework_advantage"],
            "meets_or_beats": stats["meets_or_beats"],
            "verdict": stats["verdict"],
            "resolves_gate": stats["resolves_gate"],
            "resolution": stats["resolution"],
            "note": note,
        }
        if prov and prov.get("amendments"):
            entry["amendments"] = prov["amendments"]
        matrix["entries"][key] = entry

    # Pooled AP bias: no single family's study can resolve the 0.005
    # gate at affordable n (per-seed std ~0.02-0.04 vs ~1 min/run), but
    # the SYSTEMATIC framework-vs-reference difference pooled across the
    # independent AP studies (inverse-variance fixed-effect) has a much
    # tighter CI — this is the strongest statement the rig's statistical
    # power supports, labeled for what it is.  MAE is excluded
    # (different metric scale).
    pool = [(k, e) for k, e in matrix["entries"].items()
            if e["metric"] == "test AP" and e.get("se_delta")]
    if len(pool) >= 2:
        ws = [1.0 / e["se_delta"] ** 2 for _, e in pool]
        dm = sum(w * e["delta_of_means_signed"]
                 for w, (_, e) in zip(ws, pool)) / sum(ws)
        se = (1.0 / sum(ws)) ** 0.5
        matrix["pooled_ap_bias"] = {
            "studies": [k for k, _ in pool],
            "method": "inverse-variance fixed-effect pool of the "
                      "per-family delta_of_means_signed (framework - "
                      "reference, test AP)",
            "delta": dm,
            "se": se,
            "ci95": [dm - 1.96 * se, dm + 1.96 * se],
            "ci95_halfwidth": 1.96 * se,
            "resolves_gate": bool(1.96 * se <= GATE),
            "interpretation": (
                f"pooled across {len(pool)} independent AP studies, the "
                f"systematic framework-minus-reference difference is "
                f"{dm:+.4f} +/- {1.96 * se:.4f} (95% CI)"
                + ("; the pooled CI half-width is within the 0.005 gate"
                   if 1.96 * se <= GATE else
                   f"; the pooled CI excludes any systematic framework "
                   f"deficit larger than {max(0.0, -(dm - 1.96 * se)):.4f}")),
        }
    Path(args.out).write_text(json.dumps(matrix, indent=2))
    print(f"wrote {args.out} with {len(matrix['entries'])} entries")


if __name__ == "__main__":
    main()
