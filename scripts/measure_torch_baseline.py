"""Measure the reference's PyTorch-CPU sampler/train throughput.

Runs the ACTUAL reference code (read-only at /root/reference) on torch-CPU to
establish the baseline recorded in BASELINE.md: MNIST flagship config
(GaussianTargetRateImageX0PredEMAPaul, S=256, D=784), TauL sampler. The
sampler cost is per-step-constant, so we time a few steps and extrapolate to
the full 1000-step protocol.

Usage: python scripts/measure_torch_baseline.py [N] [steps]
"""

import sys
import time
import types

# torchtyping is not installed in this image; the reference only uses it for
# annotations, so a __getitem__-able stub suffices.
tt = types.ModuleType("torchtyping")


class _TensorType:
    def __class_getitem__(cls, item):
        return object


tt.TensorType = _TensorType
tt.patch_typeguard = lambda *a, **k: None
sys.modules["torchtyping"] = tt

# timm is also absent; the reference only needs ViT Attention/Mlp for its DiT
# (not exercised here) — stub standard implementations so imports succeed.
import torch as _torch  # noqa: E402
import torch.nn as _nn  # noqa: E402

timm = types.ModuleType("timm")
timm_models = types.ModuleType("timm.models")
timm_vit = types.ModuleType("timm.models.vision_transformer")


class _Mlp(_nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=_nn.GELU, drop=0.0, **kw):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = _nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = _nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Attention(_nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = _nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = _nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


timm_vit.Attention = _Attention
timm_vit.Mlp = _Mlp
timm_vit.PatchEmbed = object
sys.modules["timm"] = timm
sys.modules["timm.models"] = timm_models
sys.modules["timm.models.vision_transformer"] = timm_vit

# torchvision / functorch imports of unused subsystems
tv = types.ModuleType("torchvision")
tv.transforms = types.ModuleType("torchvision.transforms")
tv.datasets = types.ModuleType("torchvision.datasets")
tv.datasets.MNIST = object
tv.datasets.CIFAR10 = object
sys.modules["torchvision"] = tv
sys.modules["torchvision.transforms"] = tv.transforms
sys.modules["torchvision.datasets"] = tv.datasets
loguru = types.ModuleType("loguru")


class _Logger:
    def __getattr__(self, name):
        return lambda *a, **k: None


loguru.logger = _Logger()
sys.modules["loguru"] = loguru

if "functorch" not in sys.modules:
    try:
        import functorch  # noqa: F401
    except ImportError:
        fx = types.ModuleType("functorch")
        fx.vmap = _torch.vmap
        sys.modules["functorch"] = fx

sys.path.insert(0, "/root/reference/TAUnSDDM")

import torch  # noqa: E402

torch.manual_seed(0)

from config.mnist_config.config_tauUnet_mnist import get_config  # noqa: E402
from lib.models import models  # noqa: E402
from lib.models.model_utils import create_model  # noqa: E402
from lib.sampling import sampling  # noqa: E402
from lib.sampling.sampling_utils import get_sampler  # noqa: E402
from lib.losses.losses import CTElbo  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = get_config()
    cfg.device = "cpu"
    cfg.sampler.num_steps = steps
    model = create_model(cfg, "cpu")
    model.eval()

    sampler = get_sampler(cfg)
    t0 = time.time()
    sampler.sample(model, N)
    t_total = time.time() - t0
    per_step = t_total / (steps + 1)  # +1 for the final denoise pass
    full_protocol = per_step * 1001
    print(f"sampler: {t_total:.2f}s for {steps} steps at N={N}")
    print(f"per-step: {per_step:.3f}s -> 1000-step protocol: {full_protocol:.1f}s")
    print(f"BASELINE mnist_taul_samples_per_sec = {N / full_protocol:.5f}")

    # train step
    model.train()
    loss = CTElbo(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)
    state = {"model": model, "optimizer": opt, "n_iter": 0}
    batch = torch.randint(0, 256, (cfg.data.batch_size, 1, 28, 28))
    # warmup
    l = loss.calc_loss(state, batch.view(cfg.data.batch_size, -1))
    t0 = time.time()
    n_train = 3
    for _ in range(n_train):
        opt.zero_grad()
        l = loss.calc_loss(state, batch.view(cfg.data.batch_size, -1))
        l.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 2.0)
        opt.step()
    t_train = (time.time() - t0) / n_train
    print(f"train step: {t_train:.3f}s/step at B={cfg.data.batch_size}")
    print(f"BASELINE ctelbo_train_steps_per_sec = {1.0 / t_train:.5f}")


if __name__ == "__main__":
    main()
