"""Smoke test for examples/production_zipf_training.py — the
production-regime recipe (partitioned streaming engine + scan scoring)
as a real subprocess on CPU with tiny shapes."""

import json
import os
import subprocess
import sys

EXAMPLE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "production_zipf_training.py",
)


def test_production_example_smoke():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, EXAMPLE, "--rows", "512", "--vocab", "20000",
         "--batch-size", "256", "--epochs", "2", "--scan", "2"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[done]" in out.stdout
    score_line = [l for l in out.stdout.splitlines()
                  if l.startswith("[score]")][0]
    metrics = json.loads(score_line.split("[score] ", 1)[1])
    assert metrics["auc"] > 0.8
