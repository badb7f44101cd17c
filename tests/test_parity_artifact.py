"""Dry-run of the parity-run artifact (scripts/parity_run.py): the full
orchestration executes without network/RDKit and emits a well-formed
PARITY_RESULT.json (VERDICT round-2 item 6)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_parity_dry_run(tmp_path):
    out = tmp_path / "PARITY_RESULT.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_run.py"),
         "--dry-run", "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["dry_run"] is True
    assert res["pass"] is None               # gate n/a on synthetic data
    assert res["phases"]["reference"] == "stub"
    assert 0 <= res["reference"]["test_metric"] <= 1
    assert 0 <= res["framework"]["test_metric"] <= 1
    assert res["delta"] == abs(res["framework"]["test_metric"]
                               - res["reference"]["test_metric"])


def test_parity_parses_eval_lines():
    sys.path.insert(0, str(REPO / "scripts"))
    import parity_run
    text = ("Epoch: 0 -- Loss: 1.0, AP: 0.1\n"
            "Validation -- Loss: 0.60, AP: 0.30\n"
            "Test -- Loss: 0.61, AP: 0.31\n"
            "Validation -- Loss: 0.50, AP: 0.40\n"
            "Test -- Loss: 0.52, AP: 0.41\n"
            "Validation -- Loss: 0.55, AP: 0.39\n"
            "Test -- Loss: 0.57, AP: 0.38\n")
    val, metric = parity_run.best_val_test_metric(text)
    assert val == 0.50 and metric == 0.41


def test_seed_study_direction_semantics():
    """The 0.005 gate is symmetric parity, but the build goal is
    match-or-beat: a framework mean on the better side of the metric must
    be classified framework_better / meets_or_beats, never a bare fail."""
    sys.path.insert(0, str(REPO / "scripts"))
    import parity_run

    # AP (higher better): framework clearly above -> better, not parity.
    s = parity_run.seed_study_stats(
        [0.40, 0.41, 0.42, 0.40], [0.44, 0.45, 0.43, 0.44], 0.005,
        higher_is_better=True)
    assert s["verdict"] == "framework_better"
    assert s["meets_or_beats"] is True
    assert s["pass"] is False            # strict parity gate still honest
    assert s["framework_advantage"] > 0

    # AP: framework clearly below -> worse.
    s = parity_run.seed_study_stats(
        [0.44, 0.45, 0.43, 0.44], [0.40, 0.41, 0.42, 0.40], 0.005,
        higher_is_better=True)
    assert s["verdict"] == "framework_worse"
    assert s["meets_or_beats"] is False

    # MAE (lower better): framework below reference -> better.
    s = parity_run.seed_study_stats(
        [0.94, 0.95, 0.94, 0.95], [0.90, 0.91, 0.90, 0.91], 0.005,
        higher_is_better=False)
    assert s["verdict"] == "framework_better"
    assert s["meets_or_beats"] is True
    assert s["framework_advantage"] > 0

    # Within the gate either way -> parity.
    s = parity_run.seed_study_stats(
        [0.420, 0.421], [0.423, 0.421], 0.005, higher_is_better=True)
    assert s["verdict"] == "parity"
    assert s["pass"] is True and s["meets_or_beats"] is True

    # Without a direction the legacy fields are absent (artifact shape
    # unchanged for callers that do not pass one).
    s = parity_run.seed_study_stats([0.4, 0.41], [0.4, 0.41], 0.005)
    assert "verdict" not in s and "meets_or_beats" not in s


def test_reuse_ref_artifact_data_key_guard(tmp_path):
    """--reuse-ref-artifact refuses a prior study whose data provenance
    (dataset/n/seed) differs from this run's."""
    sys.path.insert(0, str(REPO / "scripts"))
    prior = {
        "reference_seed_runs": [
            {"seed": 0, "best_val_loss": 0.3, "test_metric": 0.5}],
        "provenance": {
            "data": "synthetic:/tmp/x/data/peptides_func.npz:n=128:seed=0"},
    }
    art = tmp_path / "prior.json"
    art.write_text(json.dumps(prior))
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_run.py"),
         "--model", "hscn", "--num-graphs", "256",
         "--reuse-ref-artifact", str(art),
         "--fw-seeds", "0", "--fw-epochs", "1",
         "--out", str(tmp_path / "out.json")],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"})
    assert proc.returncode != 0
    assert "data mismatch" in (proc.stderr + proc.stdout)


def test_matrix_builder_merges_and_pools(tmp_path, monkeypatch):
    """build_parity_matrix merges base+extension artifacts per entry,
    emits CI-aware stats, and pools the signed AP deltas
    (inverse-variance) across entries — MAE excluded."""
    import importlib
    sys.path.insert(0, str(REPO / "scripts"))
    import build_parity_matrix as bpm
    importlib.reload(bpm)

    art = tmp_path / "artifacts"
    art.mkdir()

    def write(name, ref, fw):
        (art / name).write_text(json.dumps({
            "reference_seed_runs": [
                {"seed": i, "best_val_loss": 0.5, "test_metric": v}
                for i, v in enumerate(ref)],
            "framework_seed_runs": [
                {"seed": i, "best_val_loss": 0.5, "test_metric": v}
                for i, v in enumerate(fw)],
            "provenance": {"amendments": ["test fixture"]},
        }))

    write("A.json", [0.40, 0.41, 0.42, 0.41], [0.40, 0.42, 0.41, 0.41])
    write("A_EXT.json", [0.40, 0.42], [0.41, 0.40])
    write("B.json", [0.90, 0.91, 0.92, 0.91], [0.90, 0.91, 0.91, 0.92])
    monkeypatch.setattr(bpm, "REPO", tmp_path)
    monkeypatch.setattr(bpm, "ENTRIES", [
        ("x/ap_entry", "test AP", True,
         ["A.json", "A_EXT.json?", "A_MISSING.json?"], "note a"),
        ("x/ap_entry2", "test AP", True, ["A.json"], "note a2"),
        ("x/mae_entry", "test MAE", False, ["B.json"], "note b"),
        ("x/skipped", "test AP", True, ["NOPE.json"], "note c"),
    ])
    out = tmp_path / "m.json"
    monkeypatch.setattr(sys, "argv", ["x", "--out", str(out)])
    bpm.main()
    m = json.loads(out.read_text())
    assert set(m["entries"]) == {"x/ap_entry", "x/ap_entry2",
                                 "x/mae_entry"}   # missing -> skipped
    e = m["entries"]["x/ap_entry"]
    assert e["reference"]["n"] == 6 and e["framework"]["n"] == 6  # merged
    assert e["amendments"] == ["test fixture"]
    for k in ("se_delta", "ci95_halfwidth", "verdict", "resolves_gate",
              "meets_or_beats"):
        assert k in e
    pool = m["pooled_ap_bias"]
    assert set(pool["studies"]) == {"x/ap_entry", "x/ap_entry2"}  # no MAE
    assert pool["ci95_halfwidth"] > 0
    # Inverse-variance: pooled delta lies between the entry deltas.
    ds = sorted(m["entries"][k]["delta_of_means_signed"]
                for k in pool["studies"])
    assert ds[0] - 1e-12 <= pool["delta"] <= ds[-1] + 1e-12
