"""Convert InceptionV3 weights to the npz our FID loader reads.

The reference's FID protocol uses pytorch-fid's TF-ported checkpoint, NOT
torchvision's ImageNet weights: lib/datasets/mnist_is.py:15 pins
FID_WEIGHTS_URL = .../pt_inception-2015-12-05-6726825d.pth and builds the
net with use_fid_inception=True (mnist_is.py:38,81-84). The two checkpoints
share torchvision's parameter names but hold different weights; only the
pytorch-fid one reproduces published FID numbers (the reference's MNIST 1.75).

Run this on any machine with torch + internet, then copy the npz to the
training box (zero-egress) and point CTDD_INCEPTION_NPZ / --inception-weights
at it.

Usage:
  python scripts/convert_inception_weights.py [out.npz] [--family pytorch-fid|torchvision]
"""

import argparse
import os

# mnist_is.py:15 — the TF inception-2015-12-05 checkpoint as ported by
# github.com/mseitzer/pytorch-fid (torchvision-shaped state dict)
FID_WEIGHTS_URL = (
    "https://github.com/mseitzer/pytorch-fid/releases/download/"
    "fid_weights/pt_inception-2015-12-05-6726825d.pth"
)


def state_dict_to_arrays(state):
    """Filter a torchvision-shaped InceptionV3 state dict down to the pool3
    feature path (drop aux head, fc, and batchnorm counters)."""
    return {
        k: v.cpu().numpy()
        for k, v in state.items()
        if not k.startswith("AuxLogits") and not k.startswith("fc")
        and "num_batches_tracked" not in k
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="data/inception/inception_v3.npz")
    ap.add_argument(
        "--family", default="pytorch-fid",
        choices=["pytorch-fid", "torchvision"],
        help="pytorch-fid (default) = pt_inception-2015-12-05, the "
             "reference's FID protocol; torchvision = IMAGENET1K_V1, "
             "NOT comparable to published FIDs",
    )
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.family == "pytorch-fid":
        state = torch.hub.load_state_dict_from_url(
            FID_WEIGHTS_URL, progress=True, map_location="cpu"
        )
        source = FID_WEIGHTS_URL
    else:
        import torchvision

        model = torchvision.models.inception_v3(
            weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1,
            aux_logits=True,
        )
        state = model.state_dict()
        source = "torchvision inception_v3 IMAGENET1K_V1"

    arrays = state_dict_to_arrays(state)
    # provenance markers read back by ctdd_tpu.metrics.inception
    arrays["_family"] = np.asarray(args.family)
    arrays["_source"] = np.asarray(source)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays) - 2} arrays (family={args.family}) -> {args.out}")
    if args.family != "pytorch-fid":
        print(
            "WARNING: torchvision weights selected — FIDs computed with this "
            "npz are NOT comparable to pytorch-fid protocol numbers."
        )


if __name__ == "__main__":
    main()
