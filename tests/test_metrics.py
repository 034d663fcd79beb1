"""MCD / evaluation metric tests."""

import numpy as np

from matcha_tpu.utils.metrics import dct_matrix, log_mel_l1, mcd, mel_to_mfcc


def test_dct_orthonormal():
    d = dct_matrix(13, 80)
    full = dct_matrix(80, 80)
    np.testing.assert_allclose(full @ full.T, np.eye(80), atol=1e-10)
    assert d.shape == (13, 80)


def test_mcd_zero_for_identical(rng):
    mel = rng.normal(size=(80, 120))
    assert mcd(mel, mel) == 0.0
    assert log_mel_l1(mel, mel) == 0.0


def test_mcd_scales_with_perturbation(rng):
    mel = rng.normal(size=(80, 120))
    small = mcd(mel, mel + 0.01)
    large = mcd(mel, mel + 0.1)
    assert 0 < small < large
    # c0 (overall energy offset) excluded: adding a constant changes only c0
    shifted = mcd(mel, mel + 1.0)
    assert shifted < 1e-6


def test_mcd_truncates_to_common_length(rng):
    a = rng.normal(size=(80, 100))
    b = np.concatenate([a, rng.normal(size=(80, 20))], axis=1)
    assert mcd(a, b) == 0.0


def test_mfcc_shape(rng):
    out = mel_to_mfcc(rng.normal(size=(80, 50)), n_mfcc=13)
    assert out.shape == (13, 50)
