"""Direct parity against the MOUNTED REFERENCE CODE at /root/reference.

torch_geometric (and thus the reference's conv layers) cannot be installed
in this environment, but the reference's loss, metrics, and scheduling
modules are pure torch/sklearn/stdlib — so we import them directly and
assert exact agreement:

  graph_hscn.loss.criterion       (loss.py:6-19)
  graph_hscn.metrics.eval_ap/mae  (metrics.py:6-36)
  graph_hscn.train.utils.is_eval_epoch (utils.py:1-6)
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

ref_loss = pytest.importorskip("graph_hscn.loss")
ref_metrics = pytest.importorskip("graph_hscn.metrics")

from graph_hscn_tpu.train.loop import is_eval_epoch  # noqa: E402
from graph_hscn_tpu.train.loss import criterion  # noqa: E402
from graph_hscn_tpu.train.metrics import eval_ap, eval_mae  # noqa: E402


pytestmark = pytest.mark.quick   # core <5-min suite (make test-quick)

def test_criterion_bce_matches_reference():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(40, 10)).astype(np.float32)
    true = (rng.uniform(size=(40, 10)) > 0.5).astype(np.float32)
    mask = np.ones(40, bool)

    loss_ref, score_ref = ref_loss.criterion(
        "cross_entropy", torch.as_tensor(pred), torch.as_tensor(true))
    loss_j, score_j = criterion("cross_entropy", pred, true, mask)
    np.testing.assert_allclose(float(loss_j), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(score_j), score_ref.numpy(),
                               rtol=1e-6)


def test_criterion_l1_matches_reference():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(40, 11)).astype(np.float32)
    true = rng.normal(size=(40, 11)).astype(np.float32)
    mask = np.ones(40, bool)

    loss_ref, score_ref = ref_loss.criterion(
        "l1", torch.as_tensor(pred), torch.as_tensor(true))
    # Reference quirk #10: score is sigmoid(pred) even for regression.
    loss_j, score_j = criterion("l1", pred, true, mask,
                                compat_sigmoid_score=True)
    np.testing.assert_allclose(float(loss_j), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(score_j), score_ref.numpy(),
                               rtol=1e-6)


def test_eval_ap_matches_reference():
    rng = np.random.default_rng(2)
    y_true = (rng.uniform(size=(120, 10)) > 0.6).astype(np.float32)
    y_pred = rng.uniform(size=(120, 10)).astype(np.float32)
    ap_ref = ref_metrics.eval_ap(torch.as_tensor(y_true),
                                 torch.as_tensor(y_pred))
    ap_ours = eval_ap(y_true, y_pred)
    np.testing.assert_allclose(ap_ours, ap_ref, rtol=1e-7)


def test_eval_mae_matches_reference():
    rng = np.random.default_rng(3)
    y_true = rng.normal(size=(80, 11)).astype(np.float32)
    y_pred = rng.normal(size=(80, 11)).astype(np.float32)
    mae_ref = ref_metrics.eval_mae(torch.as_tensor(y_true),
                                   torch.as_tensor(y_pred))
    np.testing.assert_allclose(eval_mae(y_true, y_pred), mae_ref,
                               rtol=1e-7)


def test_is_eval_epoch_matches_reference():
    from graph_hscn.train.utils import is_eval_epoch as ref_is_eval
    for max_epochs in (7, 100, 500):
        for period in (1, 3, 10):
            for epoch in range(max_epochs):
                assert (is_eval_epoch(epoch, max_epochs, period)
                        == ref_is_eval(epoch, max_epochs, period)), (
                    epoch, max_epochs, period)


def test_eval_ap_matches_reference_under_ties_and_degenerate_columns():
    """Tied scores must form ONE precision-recall threshold (sklearn
    semantics — the reference's eval_ap delegates to sklearn) and
    single-class columns must be skipped; both regimes occur in real
    eval outputs (rounded/saturated sigmoids, always-positive labels).
    Round-4 fix: the per-sample cumsum AP diverged by up to +0.05 under
    ties."""
    import numpy as np
    import torch
    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(20, 200))
        y = (rng.random((n, 10)) < rng.random(10)).astype(np.float32)
        y[:, 0] = 1.0                       # all-positive column: skipped
        s = 1 / (1 + np.exp(-rng.normal(0, 1, (n, 10))))
        if trial % 2:
            s = np.round(s, int(rng.integers(0, 3)))   # heavy ties
        try:
            ap_ref = ref_metrics.eval_ap(torch.as_tensor(y),
                                         torch.as_tensor(s))
        except RuntimeError:
            continue
        assert abs(float(ap_ref) - float(eval_ap(y, s))) < 1e-10
