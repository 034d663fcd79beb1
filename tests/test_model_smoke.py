"""Model-level smoke tests on a tiny config (shape + finiteness).

The reference ships no tests; this follows SURVEY.md §4's designed
pyramid level (c): model-shape and loss-finiteness checks with a toy
config, jitted so they exercise the real compiled path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models import MatchaTTS

TINY = dict(
    n_vocab=178, n_feats=16, enc_n_channels=32, enc_filter_channels=64,
    enc_filter_channels_dp=32, enc_n_heads=2, enc_n_layers=2,
    dec_channels=(32, 32), dec_num_mid_blocks=1, dec_num_heads=1,
    dec_attention_head_dim=16,
)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = MatchaTTS(**TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 178, size=(2, 16)))
    xl = jnp.array([16, 11])
    y = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    yl = jnp.array([64, 40])
    params = model.init({"params": jax.random.PRNGKey(1)}, x, xl, y, yl, jax.random.PRNGKey(0))
    return model, params, (x, xl, y, yl)


def test_param_structure(tiny_model_and_params):
    model, params, _ = tiny_model_and_params
    n = sum(p.size for p in jax.tree.leaves(params))
    assert n > 1e4
    assert "encoder" in params["params"] and "decoder" in params["params"]


def test_losses_finite_and_jittable(tiny_model_and_params):
    model, params, (x, xl, y, yl) = tiny_model_and_params
    loss_fn = jax.jit(lambda p, k: model.apply(p, x, xl, y, yl, k))
    dur, prior, diff, attn = loss_fn(params, jax.random.PRNGKey(2))
    for v in (dur, prior, diff):
        assert np.isfinite(float(v)), (dur, prior, diff)
    # MAS alignment: every valid frame assigned exactly one token
    a = np.asarray(attn)
    np.testing.assert_array_equal(a[0].sum(0), np.ones(64))
    assert a[1, :, 40:].sum() == 0

@pytest.mark.slow
def test_losses_with_segment_cut(tiny_model_and_params):
    model, params, (x, xl, y, yl) = tiny_model_and_params
    loss_fn = jax.jit(
        lambda p, k: model.apply(p, x, xl, y, yl, k, out_size=32, method=MatchaTTS.losses)
    )
    dur, prior, diff, _ = loss_fn(params, jax.random.PRNGKey(3))
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))


def test_synthesise_shapes(tiny_model_and_params):
    model, params, (x, xl, _, _) = tiny_model_and_params
    synth = jax.jit(
        functools.partial(
            model.apply, method=MatchaTTS.synthesise,
            n_timesteps=2, temperature=0.667, y_max_length=64,
        )
    )
    out = synth(params, x, xl, jax.random.PRNGKey(4))
    assert out["mel"].shape == (2, TINY["n_feats"], 64)
    assert out["decoder_outputs"].shape == (2, TINY["n_feats"], 64)
    assert out["attn"].shape == (2, 16, 64)
    ml = np.asarray(out["mel_lengths"])
    assert (ml >= 1).all() and (ml <= 64).all()
    assert np.isfinite(np.asarray(out["mel"])).all()
    # Encoder outputs are masked beyond mel_lengths (decoder outputs keep
    # the unintegrated terminal noise there, like the reference).
    m = np.asarray(out["encoder_outputs"])
    assert np.abs(m[1, :, ml[1]:]).max() == 0.0

@pytest.mark.slow
def test_fused_and_two_stage_paths_identical(tiny_model_and_params):
    """The fused synthesise() graph and the encode()->decode() two-stage
    path share the duration hardening (logw clamp, matcha.py) and must
    produce bit-identical mels for the same key (VERDICT r2 Weak #4)."""
    model, params, (x, xl, _, _) = tiny_model_and_params
    key = jax.random.PRNGKey(9)
    fused = jax.jit(functools.partial(
        model.apply, method=MatchaTTS.synthesise,
        n_timesteps=3, temperature=0.667, y_max_length=64))(params, x, xl, key)
    mu_x, w_ceil, y_lengths = jax.jit(functools.partial(
        model.apply, method=MatchaTTS.encode))(params, x, xl, None)
    staged = jax.jit(functools.partial(
        model.apply, method=MatchaTTS.decode,
        n_timesteps=3, temperature=0.667, y_max_length=64))(
        params, mu_x, w_ceil, xl, y_lengths, key)
    np.testing.assert_array_equal(np.asarray(fused["mel_lengths"]),
                                  np.asarray(staged["mel_lengths"]))
    np.testing.assert_allclose(np.asarray(fused["mel"]),
                               np.asarray(staged["mel"]), rtol=0, atol=0)


def test_synthesise_garbage_logw_saturates_not_overflows(tiny_model_and_params):
    """With adversarially large duration logits, the fused path must
    saturate at the bucket edge (finite attn/mel), not overflow to inf."""
    model, params, (x, xl, _, _) = tiny_model_and_params
    blown = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.full_like(p, 1e4)
        if any(getattr(k, "key", None) == "proj_w" for k in path) else p,
        params)
    out = jax.jit(functools.partial(
        model.apply, method=MatchaTTS.synthesise,
        n_timesteps=1, y_max_length=64))(blown, x, xl, jax.random.PRNGKey(0))
    ml = np.asarray(out["mel_lengths"])
    assert (ml == 64).all()  # saturated to the bucket, not inf/garbage
    assert np.isfinite(np.asarray(out["attn"])).all()
    assert np.isfinite(np.asarray(out["mel"])).all()

@pytest.mark.slow
def test_dropout_rng_changes_training_loss(tiny_model_and_params):
    model, params, (x, xl, y, yl) = tiny_model_and_params
    loss_fn = jax.jit(
        lambda p, k, dk: model.apply(p, x, xl, y, yl, k, rngs={"dropout": dk})
    )
    k = jax.random.PRNGKey(5)
    d1 = loss_fn(params, k, jax.random.PRNGKey(6))
    d2 = loss_fn(params, k, jax.random.PRNGKey(7))
    # same data/noise keys, different dropout masks -> different diff loss
    assert float(d1[2]) != float(d2[2])

@pytest.mark.slow
def test_remat_losses_match(tiny_model_and_params):
    """remat=True recomputes activations but must not change values."""
    from matcha_tpu.models import MatchaTTS

    _, params, (x, xl, y, yl) = tiny_model_and_params
    m_plain = MatchaTTS(**TINY)
    m_remat = MatchaTTS(**TINY, remat=True)
    k = jax.random.PRNGKey(11)

    def total(model):
        loss_fn = jax.jit(lambda p: sum(model.apply(p, x, xl, y, yl, k)[:3]))
        val = loss_fn(params)
        grad = jax.jit(jax.grad(lambda p: sum(model.apply(p, x, xl, y, yl, k)[:3])))(params)
        gn = sum(float(np.abs(g).sum()) for g in jax.tree.leaves(grad))
        return float(val), gn

    v1, g1 = total(m_plain)
    v2, g2 = total(m_remat)
    assert abs(v1 - v2) < 1e-4
    assert abs(g1 - g2) / max(g1, 1e-6) < 1e-3

@pytest.mark.slow
def test_conformer_decoder_block_option():
    """Config-selectable conformer U-Net blocks (reference decoder.py:318
    get_block / ConformerWrapper :161-198): losses + synthesis run, finite,
    and the param tree actually contains conformer modules."""
    model = MatchaTTS(**TINY, dec_down_block_type="conformer",
                      dec_mid_block_type="conformer", dec_up_block_type="conformer")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 178, size=(2, 16)))
    xl = jnp.array([16, 11])
    y = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    yl = jnp.array([64, 40])
    params = model.init({"params": jax.random.PRNGKey(1)}, x, xl, y, yl, jax.random.PRNGKey(0))
    dec = params["params"]["decoder"]
    assert "mid_0_conformer_0" in dec and "down_0_conformer_0" in dec
    assert "attn" in dec["mid_0_conformer_0"] and "conv" in dec["mid_0_conformer_0"]

    dur, prior, diff, _ = jax.jit(
        lambda p: model.apply(p, x, xl, y, yl, jax.random.PRNGKey(2))
    )(params)
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))

    out = model.apply(params, x, xl, jax.random.PRNGKey(3), n_timesteps=2,
                      y_max_length=64, method=MatchaTTS.synthesise)
    assert out["mel"].shape == (2, 16, 64)
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_metric_logger_missing_backends_degrade_gracefully(tmp_path):
    """wandb/mlflow/neptune/comet/aim configs must not crash when the
    client library is absent (reference ships 8 config-selectable logger
    backends; this environment installs none of the external ones)."""
    from matcha_tpu.training.trainer import MetricLogger

    lg = MetricLogger(None, str(tmp_path / "m.csv"),
                      backends={"wandb": {}, "mlflow": {}, "neptune": {},
                                "comet": {}, "aim": {}, "bogus": {}})
    lg.scalars({"loss/train": 1.0}, 1)
    lg.close()
    assert (tmp_path / "m.csv").exists()


@pytest.mark.slow
def test_synthesise_bf16_compute_dtype_close_to_f32(tiny_model_and_params):
    """``compute_dtype=bf16`` (the TTSPipeline bf16_latency mode) runs the
    CFM Euler loop in bf16 against a bf16 decoder param subtree. Contract:
    durations/mel_lengths are BIT-identical to f32 (encoder + duration
    math stay f32), the returned mel is f32, and — because cfm_sample
    draws its noise in f32 and casts — the trajectories start from the
    same z, so the mel deviation is bf16-rounding-scale, not a different
    random sample."""
    model, params, (x, xl, _, _) = tiny_model_and_params
    synth = jax.jit(
        functools.partial(model.apply, method=MatchaTTS.synthesise,
                          n_timesteps=4, temperature=0.667, y_max_length=64),
        static_argnames=("compute_dtype",),
    )
    out32 = synth(params, x, xl, jax.random.PRNGKey(4))

    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    p16 = {"params": {k: (cast(v) if k == "decoder" else v)
                      for k, v in params["params"].items()}}
    out16 = synth(p16, x, xl, jax.random.PRNGKey(4), compute_dtype=jnp.bfloat16)

    assert out16["mel"].dtype == jnp.float32
    np.testing.assert_array_equal(out32["mel_lengths"], out16["mel_lengths"])
    m32, m16 = np.asarray(out32["mel"]), np.asarray(out16["mel"])
    assert np.isfinite(m16).all()
    d = np.abs(m32 - m16)
    # measured on this config: max ~0.045, mean ~0.005 (mel range ~3.6)
    assert d.max() < 0.3 and d.mean() < 0.05, (d.max(), d.mean())
