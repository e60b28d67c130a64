"""run_parity.py gating: without real assets it must report a clean SKIP
(exit 0) listing exactly what is missing — never crash or half-run."""

import subprocess
import sys
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_harness_skips_cleanly_without_assets():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "run_parity.py")],
        capture_output=True, text=True, cwd=_REPO, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    assert "Asset checklist" in out
    assert "PARITY SKIPPED" in out
    assert "MISSING" in out


def test_parity_metric_unit_classifier():
    sys.path.insert(0, _REPO)
    from run_parity import _is_mm
    assert _is_mm("PVE-PA")
    assert _is_mm("MPJPE-SC_samples_min")
    assert not _is_mm("silhouette-IOU")
    assert not _is_mm("joints2D-L2E")
