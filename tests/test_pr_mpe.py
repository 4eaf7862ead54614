"""Golden-file regression: rescoring the reference's bundled KITTI-08 outcome must
reproduce the published numbers (BASELINE.md / SURVEY.md section 6).
"""

import os

import numpy as np
import pytest

from contour_context_tpu.eval.pr_mpe import score_outcome

GT = "/root/reference/sample_data/ts-sens_pose-kitti08.txt"
OUTCOME = "/root/reference/results/outcome_txt/outcome-kitti08.txt"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GT) and os.path.exists(OUTCOME)),
    reason="reference golden files not available")


def test_kitti08_golden_scores():
    r = score_outcome(GT, OUTCOME)
    assert abs(r.max_f1 - 0.9556) < 2e-4, r.max_f1
    assert abs(r.max_f1_thres - 0.649282) < 1e-6, r.max_f1_thres
    assert abs(r.recall_at_p1 - 0.3401) < 2e-4, r.recall_at_p1
    assert r.tp_count == 323
    assert abs(r.trans_mean - 0.202) < 2e-3
    assert abs(r.trans_rmse - 0.225) < 2e-3
    assert abs(r.rot_mean_deg - 0.345) < 2e-3
    assert abs(r.rot_rmse_deg - 0.471) < 2e-3


def test_pr_curve_monotone_recall_sorted():
    r = score_outcome(GT, OUTCOME)
    # sanity: sweep produces valid probabilities
    assert np.all(r.pr_points >= 0) and np.all(r.pr_points <= 1 + 1e-12)


def test_plot_pr_curves(tmp_path):
    from contour_context_tpu.eval.pr_mpe import plot_pr_curves

    r = score_outcome(GT, OUTCOME)
    out = str(tmp_path / "pr.png")
    plot_pr_curves([r, r], ["a", "b"], out)
    assert os.path.getsize(out) > 1000
