"""InceptionV3 pool3 feature extractor (FID) in flax.

Counterpart of reference lib/datasets/mnist_is.py:18-332 (a torch InceptionV3
port used only for FID features). Architecture follows the canonical
torchvision/pytorch-fid InceptionV3 feature path up to the 2048-d pool3
vector: BasicConv2d = conv(no bias) + batchnorm(eps=1e-3) + relu, blocks
A(x3) B C(x4) D E(x2), aux head omitted.

Weights: this box is zero-egress, so pretrained parameters must be supplied
as a local .npz whose keys are the torchvision parameter names
("Conv2d_1a_3x3.conv.weight", "Mixed_5b.branch1x1.bn.running_mean", ...).
`load_torch_inception_npz` maps them into the flax tree (OIHW -> HWIO).
Without weights the module still runs (random init) — features are then only
useful as a relative signal, and callers should prefer feature_kind='lenet'.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: tuple | str = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _pool(x, kind, window, stride, padding="VALID"):
    if kind == "max":
        return nn.max_pool(x, (window, window), (stride, stride), padding)
    return nn.avg_pool(
        x, (window, window), (stride, stride), padding,
        count_include_pad=False,
    )


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = _pool(x, "avg", 3, 1, ((1, 1), (1, 1)))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _pool(x, "max", 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _pool(x, "avg", 3, 1, ((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _pool(x, "max", 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # pytorch-fid uses max in the final block's pool

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool(x, self.pool_kind, 3, 1, ((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """(B, 299, 299, 3) in [0,1] -> (B, 2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        # torchvision normalization: (x - 0.5) / 0.5
        x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = _pool(x, "max", 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _pool(x, "max", 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool_kind="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> 2048


def inception_npz_family(path: str) -> str:
    """Checkpoint provenance recorded by scripts/convert_inception_weights.py.

    'pytorch-fid' = pt_inception-2015-12-05 (the reference's FID protocol,
    mnist_is.py:15,81-84 — use_fid_inception=True); 'torchvision' =
    IMAGENET1K_V1 (NOT comparable to published FIDs); 'unknown' = npz predates
    the provenance marker."""
    with np.load(path) as arrays:
        if "_family" in arrays:
            return str(arrays["_family"])
    return "unknown"


def load_torch_inception_npz(path: str, variables, strict: bool = True):
    """Map torchvision-named arrays into the flax variable tree.

    With strict=True (default), raises if any flax leaf has no source array
    or any non-metadata array goes unconsumed — a conversion/coverage bug
    would otherwise silently leave random-init layers in the feature net.
    """
    import flax

    arrays = dict(np.load(path))
    meta = {k for k in arrays if k.startswith("_")}
    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables), sep="/"
    )
    out = dict(flat)
    consumed = set()
    unmapped = []
    for key in flat:
        # e.g. params/Mixed_5b/branch1x1/conv/kernel
        parts = key.split("/")
        modpath, leaf = parts[1:-2], parts[-2:]
        tname = ".".join(modpath + [leaf[0]])
        if leaf == ["conv", "kernel"]:
            src = tname + ".weight"
        elif leaf == ["bn", "scale"]:
            src = tname + ".weight"
        elif leaf == ["bn", "bias"]:
            src = tname + ".bias"
        elif leaf == ["bn", "mean"]:
            src = tname + ".running_mean"
        elif leaf == ["bn", "var"]:
            src = tname + ".running_var"
        else:
            unmapped.append(key)
            continue
        if src not in arrays:
            unmapped.append(key)
            continue
        w = arrays[src]
        if leaf == ["conv", "kernel"]:
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        out[key] = jnp.asarray(w)
        consumed.add(src)
    leftovers = sorted(set(arrays) - consumed - meta)
    if strict and (unmapped or leftovers):
        raise ValueError(
            f"inception npz mapping incomplete: {len(unmapped)} flax leaves "
            f"without a source array {unmapped[:5]}..., {len(leftovers)} "
            f"unconsumed arrays {leftovers[:5]}..."
        )
    return flax.core.freeze(flax.traverse_util.unflatten_dict(out, sep="/"))


def inception_pool3_features(weights_path: Optional[str] = None):
    """Returns fn(images_f32_nhwc3 in [0,1]) -> (N, 2048) features."""
    net = InceptionV3Features()
    variables = None

    def fn(images: np.ndarray) -> np.ndarray:
        nonlocal variables
        x = jnp.asarray(images, jnp.float32)
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, 3), method="bilinear"
        )
        if variables is None:
            variables = net.init(jax.random.PRNGKey(0), x[:1])
            if weights_path:
                variables = load_torch_inception_npz(weights_path, variables)
        return np.asarray(
            jax.jit(lambda v, y: net.apply(v, y))(variables, x)
        )

    return fn
