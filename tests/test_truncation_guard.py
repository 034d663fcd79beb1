"""Fused-path saturation guards (VERDICT r4: silent truncation).

The fused single-jit graph pads mel to a fixed bucket; an utterance whose
predicted length reaches the bucket is clipped. Reference behavior is
always-full-length audio (dynamic shapes, matcha/models/matcha_tts.py:
118-131), so clipping must never ship silently:

* ``fixed_y_bucket="auto"`` escalates buckets, and at the TOP bucket falls
  back to the dynamic length-general path with a warning;
* an integer ``--fixed-y-bucket`` is dispatch-only (no host sync inside
  the pipeline), so the CLI checks the fetched lengths via
  ``synth_fetch_guarded`` and re-runs dynamically on saturation.
"""

import numpy as np
import pytest

from tests.test_bench_guard import TINY, tiny_pipeline  # noqa: F401 (fixture)


def _long_utt(rng, n=48):
    return rng.integers(1, 178, size=(1, n)).astype(np.int32)


def _args(x):
    return x, np.asarray([x.shape[-1]], np.int32)


def test_auto_top_bucket_falls_back_to_dynamic(tiny_pipeline, rng):  # noqa: F811
    import jax

    pipeline = tiny_pipeline
    x, xl = _args(_long_utt(rng))
    key = jax.random.PRNGKey(0)
    # shrink the fused bucket table so this utterance saturates the top
    pipeline.FUSED_Y_BUCKETS = (64,)
    with pytest.warns(UserWarning, match="saturated the largest fused"):
        out = pipeline.synthesise_batch(
            x, xl, key, n_timesteps=2, length_scale=3.5,
            fixed_y_bucket="auto")
    ml = int(out["mel_lengths_host"][0])
    assert ml > 64, "fallback must produce the full (un-clipped) length"
    assert out["mel"].shape[-1] >= ml
    from matcha_tpu.cli import fetch_fused_host

    wavs, mls = fetch_fused_host(out)
    assert int(mls[0]) == ml
    assert wavs.shape[-1] >= ml  # waveform covers the full mel length


def test_auto_top_bucket_fallback_keeps_pcm24_contract(tiny_pipeline, rng):  # noqa: F811
    import jax

    pipeline = tiny_pipeline
    x, xl = _args(_long_utt(rng))
    pipeline.FUSED_Y_BUCKETS = (64,)
    with pytest.warns(UserWarning, match="saturated the largest fused"):
        out = pipeline.synthesise_batch(
            x, xl, jax.random.PRNGKey(1), n_timesteps=2, length_scale=3.5,
            fixed_y_bucket="auto", raw_pcm24=True, key_fold=7)
    assert out["pcm24_bytes_host"] is not None
    from matcha_tpu.cli import _unpack_pcm24

    wav, mls = _unpack_pcm24(out["pcm24_bytes_host"])
    assert int(mls[0]) == int(out["mel_lengths_host"][0]) > 64
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0


def test_integer_bucket_guard_reruns_dynamic(tiny_pipeline, rng):  # noqa: F811
    import jax

    from matcha_tpu.cli import synth_fetch_guarded

    pipeline = tiny_pipeline
    x, xl = _args(_long_utt(rng))
    key = jax.random.PRNGKey(2)
    with pytest.warns(UserWarning, match="fixed-y-bucket 64 saturated"):
        out, wavs, mls = synth_fetch_guarded(
            pipeline, x, xl, key, fixed_y_bucket=64,
            n_timesteps=2, length_scale=3.5)
    ml = int(mls[0])
    assert ml > 64
    # agrees with the dynamic path run directly (same key => same audio)
    ref = pipeline.synthesise_batch(x, xl, key, n_timesteps=2,
                                    length_scale=3.5)
    assert int(np.asarray(ref["mel_lengths"])[0]) == ml
    np.testing.assert_allclose(
        np.asarray(wavs)[0, : ml], np.asarray(ref["waveform"])[0, : ml],
        rtol=0, atol=1e-6)


def test_integer_bucket_no_retry_when_it_fits(tiny_pipeline, rng):  # noqa: F811
    """A big-enough integer bucket passes through without warning."""
    import warnings as w

    import jax

    from matcha_tpu.cli import synth_fetch_guarded

    pipeline = tiny_pipeline
    x, xl = _args(_long_utt(rng, n=12))
    with w.catch_warnings():
        w.simplefilter("error")
        out, wavs, mls = synth_fetch_guarded(
            pipeline, x, xl, jax.random.PRNGKey(3), fixed_y_bucket=256,
            n_timesteps=2, length_scale=3.5)
    assert 0 < int(mls[0]) < 256
