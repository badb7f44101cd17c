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
