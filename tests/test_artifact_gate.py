"""The real-artifact MCD gate must be live code, not a dead script.

scripts/artifact_gate.py records "blocked" in this egress-less sandbox,
but its measurement path (convert -> drive our stack AND the actual
reference stack with injected noise -> MCD) must work the moment the
downloads succeed. Here it runs on the fabricated reference-format
checkpoint: identical weights through both stacks must give MCD ~ 0,
far inside the <= 0.1 release gate.
"""

import sys

import pytest

torch = pytest.importorskip("torch")

from tests.test_cli_e2e import fabricated_ckpts  # noqa: F401,E402 (fixture)


@pytest.mark.slow
def test_gate_measures_near_zero_mcd_on_fabricated_ckpt(fabricated_ckpts, monkeypatch):  # noqa: F811
    import os

    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from artifact_gate import MCD_GATE, run_gate

    home = os.path.join(fabricated_ckpts, "matcha_tpu")
    value = run_gate(os.path.join(home, "matcha_ljspeech.ckpt"),
                     os.path.join(home, "hifigan_T2_v1"))
    assert value <= MCD_GATE, f"gate would fail on identical weights: {value}"
    assert value < 0.02, f"same-weights MCD should be ~0, got {value}"
