"""CLI smoke test on the shipped poletele data (subset, CPU)."""

import os
import subprocess
import sys

import pytest

DATA = "/root/reference/TESTS/TEST4/data"


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data not mounted")
def test_cli_poletele_subset(tmp_path):
    out_prefix = str(tmp_path / "pole")
    cmd = [
        sys.executable, "-m",
        "preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.cli",
        "--data-dir", DATA, "--name", "poletele", "--kernel", "gaussian",
        "--window", "g", "--operator", "dense", "--precond", "nystrom",
        "--ntrain", "300", "--ntest", "50", "--adam-maxits", "2",
        "--learn-maxits", "8", "--rank", "30", "--platform", "cpu", "--x64",
        "--out-prefix", out_prefix,
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "prediction RMSE" in r.stdout
    rmse = float(r.stdout.split("prediction RMSE:")[1].split()[0])
    assert rmse < 1.0
    assert os.path.exists(out_prefix + "_pred.txt")
    assert os.path.exists(out_prefix + "_loss.txt")
