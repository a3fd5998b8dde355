"""Convert torchvision InceptionV3 weights to the npz our FID loader reads.

Run this on any machine with torchvision + internet, then copy the npz to
data/inception/inception_v3.npz on the training box (this box is zero-egress).

Usage: python scripts/convert_inception_weights.py [out.npz]
"""

import sys


def main(out_path="data/inception/inception_v3.npz"):
    import numpy as np
    import torchvision

    model = torchvision.models.inception_v3(
        weights=torchvision.models.Inception_V3_Weights.IMAGENET1K_V1,
        aux_logits=True,
    )
    state = model.state_dict()
    arrays = {
        k: v.numpy()
        for k, v in state.items()
        if not k.startswith("AuxLogits") and not k.startswith("fc")
        and "num_batches_tracked" not in k
    }
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
