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
    """Offline MCD dress rehearsal (VERDICT r3 item 2): the gate's FULL
    composed measurement — text → reference synthesise (actual torch
    modules, injected noise) → reference HiFi-GAN → reference Denoiser →
    wav, versus the same converted weights through matcha_tpu's fused
    vocode tail — must read ~0 at identical weights, for BOTH the mel-
    and the composed wav-level MCD the blocked artifact gate will assert
    the day the pretrained checkpoints are reachable."""
    import os

    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from artifact_gate import MCD_GATE, run_gate

    home = os.path.join(fabricated_ckpts, "matcha_tpu")
    res = run_gate(os.path.join(home, "matcha_ljspeech.ckpt"),
                   os.path.join(home, "hifigan_T2_v1"))
    assert res["mel_mcd"] <= MCD_GATE, f"gate would fail on identical weights: {res}"
    assert res["mel_mcd"] < 0.02, f"same-weights mel MCD should be ~0, got {res}"
    assert res["wav_mcd"] <= MCD_GATE, f"composed text->wav MCD too high: {res}"
    assert res["wav_max_dev"] < 5e-3, f"delivered waveforms diverge: {res}"
