"""FID harness tests (math identities + pipeline smoke)."""

import numpy as np
import pytest

from ctdd_tpu.metrics.fid import (
    activation_statistics,
    calculate_frechet_distance,
    evaluate_fid_score,
    preprocess_images,
)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(512, 16)
    mu, sigma = activation_statistics(f)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_gaussian_closed_form():
    # For isotropic Gaussians: FID = ||mu1-mu2||² + tr(s1+s2-2(s1 s2)^1/2)
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d)
    s1 = np.eye(d) * 2.0
    s2 = np.eye(d) * 0.5
    want = d * 1.0 + np.trace(s1 + s2 - 2 * np.sqrt(s1 @ s2))
    got = calculate_frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_preprocess_images():
    imgs = np.random.randint(0, 256, (4, 1, 8, 8), np.uint8)
    x = preprocess_images(imgs)
    assert x.shape == (4, 8, 8, 3)
    assert 0 <= x.min() and x.max() <= 1.0


def test_fid_pipeline_discriminates():
    rng = np.random.RandomState(0)
    a = rng.randint(0, 256, (64, 1, 8, 8), np.uint8)
    b = a.copy()
    c = np.zeros_like(a)
    fid_same = evaluate_fid_score(a, b, feature_kind="lenet")
    fid_diff = evaluate_fid_score(a, c, feature_kind="lenet")
    assert fid_same < 1e-3
    assert fid_diff > fid_same + 1.0


@pytest.mark.slow
def test_inception_runs_random_weights():
    from ctdd_tpu.metrics.inception import inception_pool3_features

    fn = inception_pool3_features(None)
    x = np.random.rand(2, 32, 32, 3).astype(np.float32)
    feats = fn(x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


def test_trained_classifier_features_discriminate():
    """Features trained as a classifier separate the classes the random-conv
    features cannot: FID between two halves of the same class distribution
    stays near zero while FID against a class-shifted set is large."""
    from ctdd_tpu.metrics.fid import trained_classifier_features

    rng = np.random.RandomState(0)
    # two "classes": dark images (label 0) and bright images (label 1)
    dark = rng.randint(0, 60, (96, 1, 8, 8)).astype(np.uint8)
    bright = rng.randint(196, 256, (96, 1, 8, 8)).astype(np.uint8)
    images = np.concatenate([dark, bright])
    labels = np.concatenate([np.zeros(96, np.int32), np.ones(96, np.int32)])
    fn = trained_classifier_features(
        images, labels, steps=60, batch=64, feature_dim=32, n_classes=2
    )
    fid_same = evaluate_fid_score(dark[:48], dark[48:], feature_kind=fn)
    fid_shift = evaluate_fid_score(dark[:48], bright[:48], feature_kind=fn)
    assert fid_shift > 10 * max(fid_same, 1e-9)
