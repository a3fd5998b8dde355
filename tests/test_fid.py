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


@pytest.fixture(scope="module")
def inception_variables():
    import jax
    import jax.numpy as jnp

    from ctdd_tpu.metrics.inception import InceptionV3Features

    net = InceptionV3Features()
    # 75x75 is the smallest size whose stem survives the VALID convs; init
    # only builds shapes, so it stands in for 299 here
    return net.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))


def _torchvision_named_arrays(variables, rng):
    """Synthetic torchvision-shaped state dict covering every flax leaf."""
    import flax

    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables), sep="/"
    )
    arrays = {}
    for key, val in flat.items():
        parts = key.split("/")
        modpath, leaf = parts[1:-2], parts[-2:]
        tname = ".".join(modpath + [leaf[0]])
        if leaf == ["conv", "kernel"]:
            h, w, i, o = val.shape
            arrays[tname + ".weight"] = rng.randn(o, i, h, w).astype(
                np.float32
            )
        elif leaf == ["bn", "scale"]:
            arrays[tname + ".weight"] = rng.randn(*val.shape).astype(
                np.float32
            )
        elif leaf == ["bn", "bias"]:
            arrays[tname + ".bias"] = rng.randn(*val.shape).astype(np.float32)
        elif leaf == ["bn", "mean"]:
            arrays[tname + ".running_mean"] = rng.randn(*val.shape).astype(
                np.float32
            )
        elif leaf == ["bn", "var"]:
            arrays[tname + ".running_var"] = np.abs(
                rng.randn(*val.shape)
            ).astype(np.float32)
    return arrays


def test_inception_npz_mapping_complete(tmp_path, inception_variables):
    """Converter/loader completeness (VERDICT r2 #3): a torchvision-named
    npz for every layer loads with zero unmapped flax leaves and zero
    unconsumed arrays, and values land transposed correctly."""
    import flax

    from ctdd_tpu.metrics.inception import (
        inception_npz_family, load_torch_inception_npz,
    )

    rng = np.random.RandomState(0)
    arrays = _torchvision_named_arrays(inception_variables, rng)
    # canonical invariants of the torchvision/pytorch-fid pool3 path:
    # 94 BasicConv2d layers, each with conv.weight + 4 bn arrays
    convs = [k for k in arrays if k.endswith(".conv.weight")]
    assert len(convs) == 94, len(convs)
    assert len(arrays) == 94 * 5
    for name in (
        "Conv2d_1a_3x3.conv.weight",
        "Conv2d_4a_3x3.bn.running_var",
        "Mixed_5b.branch5x5_2.conv.weight",
        "Mixed_6e.branch7x7dbl_5.bn.weight",
        "Mixed_7c.branch_pool.bn.running_mean",
    ):
        assert name in arrays, name

    path = tmp_path / "inception.npz"
    np.savez(path, _family=np.asarray("pytorch-fid"), **arrays)
    assert inception_npz_family(str(path)) == "pytorch-fid"

    loaded = load_torch_inception_npz(str(path), inception_variables)
    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(loaded), sep="/"
    )
    got = np.asarray(flat["params/Conv2d_1a_3x3/conv/kernel"])
    want = np.transpose(arrays["Conv2d_1a_3x3.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(flat["batch_stats/Mixed_7c/branch_pool/bn/mean"])
    np.testing.assert_allclose(
        got_bn, arrays["Mixed_7c.branch_pool.bn.running_mean"], rtol=1e-6
    )


def test_inception_npz_strict_failures(tmp_path, inception_variables):
    from ctdd_tpu.metrics.inception import load_torch_inception_npz

    rng = np.random.RandomState(1)
    arrays = _torchvision_named_arrays(inception_variables, rng)

    missing = dict(arrays)
    missing.pop("Mixed_7b.branch1x1.conv.weight")
    p1 = tmp_path / "missing.npz"
    np.savez(p1, **missing)
    with pytest.raises(ValueError, match="without a source array"):
        load_torch_inception_npz(str(p1), inception_variables)

    extra = dict(arrays)
    extra["fc.weight"] = np.zeros((10, 2048), np.float32)
    p2 = tmp_path / "extra.npz"
    np.savez(p2, **extra)
    with pytest.raises(ValueError, match="unconsumed"):
        load_torch_inception_npz(str(p2), inception_variables)


def test_inception_npz_family_unknown(tmp_path):
    from ctdd_tpu.metrics.inception import inception_npz_family

    p = tmp_path / "old.npz"
    np.savez(p, x=np.zeros(3))
    assert inception_npz_family(str(p)) == "unknown"


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
