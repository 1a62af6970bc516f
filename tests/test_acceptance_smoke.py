"""The TPU acceptance drive must also pass on CPU (same code path).

Runs benchmarks/tpu_acceptance.py in-process on the CPU backend —
config 2 (WBFM stereo, both modes) and config 3 (8-station fused
pipeline). Config 1 (2.4 MS/s MFM) is covered by benchmarks/fidelity.py
and skipped here for suite runtime.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_acceptance():
    path = os.path.join(REPO, "benchmarks", "tpu_acceptance.py")
    spec = importlib.util.spec_from_file_location("tpu_acceptance", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_acceptance_configs_2_3_pass(capsys):
    mod = _load_acceptance()
    rc = mod.main(["--configs", "2,3"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert '"acceptance": "PASS"' in out
