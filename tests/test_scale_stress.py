"""10x scale-stress gate for the heaviest shufflers (VERDICT r8 ask #8).

Runs tools/scale_stress.py in its own process (the stage-metrics REST API
needs SPARK_GRAFT_UI=1 at JVM launch, which the shared test session does
not set): builds a 10x join-consistent blow-up of sf0.1 and asserts every
top-10 shuffler finishes with ZERO disk spill and <2 GB shuffled — the
super-linear-growth check sf0.1 alone cannot provide."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_top_shufflers_survive_10x():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "scale_stress.py")],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=ROOT,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    rec = json.loads(line)
    assert proc.returncode == 0, (rec, proc.stderr[-2000:])
    assert not rec["failures"] and not rec["over_cap"] and not rec["disk_spilled"]
    assert len(rec["per_query"]) == 10
