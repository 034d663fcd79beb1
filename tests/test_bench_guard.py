"""bench.py robustness guards (the round-4 lesson: BENCH_r04 died rc=124
when latency probes recompiled cold through the remote-compile tunnel).

Pins the three contract pieces:

* ``count_compiles`` really observes XLA compile requests (and only those:
  in-memory executable reuse counts zero);
* the timed/probed regions of the bench flow are compile-free after the
  explicit warmup phase — exercised end-to-end on a tiny CPU pipeline
  through the very same ``run_batched``/``warm_probes``/``probe_*``
  functions the real bench runs;
* ``main`` ALWAYS prints its one-line JSON record, even when setup fails
  outright, and the budget gate records skips instead of dying.
"""

import json

import numpy as np
import pytest

import bench
from tests.test_deploy_and_vocoder import TINY_HIFI

TINY = dict(
    n_vocab=178, n_feats=8, enc_n_channels=16, enc_filter_channels=24,
    enc_filter_channels_dp=12, enc_n_heads=2, enc_n_layers=1,
    dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
    dec_attention_head_dim=8,
)


@pytest.fixture(scope="module", autouse=True)
def _counter():
    bench._install_compile_counter()


def test_budget_gate_records_skips():
    b = bench.Budget(total_s=1000.0)
    assert b.gate("plenty", 10.0)
    assert b.skipped == []
    b.total = 0.0  # exhausted
    assert not b.gate("late_probe", 10.0)
    assert b.skipped == ["late_probe"]


def test_compile_counter_sees_new_graphs_and_not_warm_calls():
    import jax
    import jax.numpy as jnp

    # a graph this process has never compiled (unique constant)
    f = jax.jit(lambda a: a * 2.0 + 0.12345678)
    with bench.count_compiles() as cold:
        float(f(jnp.float32(1.0)))
    assert cold.count >= 1, "fresh jit call must register a compile request"
    with bench.count_compiles() as warm:
        float(f(jnp.float32(2.0)))
    assert warm.count == 0, "in-memory executable reuse must count zero"


def test_main_always_prints_record_on_failure(monkeypatch, capsys):
    import signal

    before = {sig: signal.getsignal(sig)
              for sig in (signal.SIGTERM, signal.SIGALRM)}
    monkeypatch.setattr(bench, "_wait_for_devices",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("no devices")))
    bench.main()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    record = json.loads(last)  # must be valid one-line JSON
    assert record["value"] is None
    assert any("no devices" in e for e in record["errors"])
    assert "bench_wall_s" in record
    # main() must restore the process signal disposition: a leaked handler
    # turns an external SIGTERM into a BudgetExceeded inside whatever
    # unrelated test runs later (observed with a session-kill SIGTERM)
    after = {sig: signal.getsignal(sig)
             for sig in (signal.SIGTERM, signal.SIGALRM)}
    assert after == before, "bench.main leaked signal handlers"


@pytest.fixture(scope="module")
def tiny_pipeline():
    import jax
    import jax.numpy as jnp

    from matcha_tpu.cli import TTSPipeline
    from matcha_tpu.models.hifigan import Generator
    from matcha_tpu.models.matcha import MatchaTTS

    model = MatchaTTS(**TINY)
    params = model.init(
        {"params": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16), jnp.int32), jnp.full((1,), 16, jnp.int32),
        jax.random.PRNGKey(0), n_timesteps=1, y_max_length=64,
        method=MatchaTTS.synthesise,
    )
    voc = Generator(TINY_HIFI.__class__(**{**TINY_HIFI.__dict__,
                                           "num_mels": TINY["n_feats"]}))
    vp = voc.init(jax.random.PRNGKey(2),
                  jnp.zeros((1, 64, TINY["n_feats"])))
    return TTSPipeline(model, params, voc, vp, None)


@pytest.mark.slow
def test_timed_regions_are_compile_free(tiny_pipeline):
    """The real invariant: after bench's warmup phase, every timed/probed
    region runs with ZERO compile requests — same functions, tiny model."""
    import jax

    pipeline = tiny_pipeline
    rng = np.random.default_rng(0)
    utts = [rng.integers(1, 178, size=(int(n),)).astype(np.int32)
            for n in (12, 17, 21, 26, 30)]
    key = jax.random.PRNGKey(0)

    # warmup sweep (compiles land here), then the timed sweep must not
    bench.run_batched(pipeline, utts, key)
    with bench.count_compiles() as cc:
        audio_s, wall = bench.run_batched(
            pipeline, utts, jax.random.fold_in(key, 1))
    assert cc.count == 0, "timed corpus sweep compiled after warmup"
    assert audio_s > 0 and wall > 0

    # latency probes: warm first, then every probe region pins zero
    sentences = {"typical": rng.integers(1, 178, (1, 10)).astype(np.int32),
                 "long": rng.integers(1, 178, (1, 18)).astype(np.int32)}
    bench.calibrate_probe_ratio(pipeline, sentences, key)
    # the seed keeps the first auto call off the largest bucket
    assert pipeline._dur_ratio is not None
    assert (pipeline._auto_y_bucket(10, bench.LENGTH_SCALE)
            < pipeline.FUSED_Y_BUCKETS[-1])
    warm = bench.warm_probes(pipeline, sentences, key)

    for name, x in sentences.items():
        with bench.count_compiles() as cc:
            r = bench.probe_sentence(pipeline, x, key, n_calls=2)
        assert cc.count == 0, f"latency probe '{name}' compiled after warmup"
        assert r["auto_bucket"] == warm["buckets"][name]["bucket"]

    with bench.count_compiles() as cc:
        bench.probe_rtt(warm["tiny"], n_calls=2)
        bench.probe_payload(warm["buf_fn"], warm["k"], n_calls=2)
        bkt = warm["buckets"]["typical"]["bucket"]
        bench.probe_queued(pipeline, sentences["typical"], key, bkt, 0.0, n_q=2)
        bench.probe_pipelined(pipeline, sentences["typical"], key, bkt,
                              n_calls=2)
    assert cc.count == 0, "rtt/payload/queued/pipelined probes compiled"
