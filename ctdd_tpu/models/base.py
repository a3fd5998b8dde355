"""Model composition: network × forward process, functionally.

The reference composes models by multiple inheritance
(EMA × network-wrapper × forward-process mixin, lib/models/models.py:832-1083)
and swaps EMA weights statefully for eval. Here a model is a plain bundle:

- `module`:  a flax module mapping (x:(B,D) or (B,C,H,W), t:(B,)) -> logits
             (B, D, S)  — the network wrapper families of models.py
- `process`: a ForwardProcess pytree (rate/transition/transit_between)
- params live OUTSIDE the model in TrainState {params, ema_params}, so the
  reference's stateful EMA `train()` swap (models.py:806-823) becomes "pass
  ema_params to the sampler" — same behavior, no mutation.

`create_model(cfg)` resolves cfg.model.name through the model registry, as
reference model_utils.create_model (model_utils.py:20-27) does.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctdd_tpu import registry
from ctdd_tpu.ops.forward_process import ForwardProcess, build_process


@dataclasses.dataclass(frozen=True)
class DiffusionModel:
    """A score network bound to its CTMC forward process.

    `bound_label`/`cfg_scale` support label-conditional sampling: samplers
    call `apply(params, x, t)` with no label argument, so conditioning is
    bound into the model handle instead. With cfg_scale > 0 the forward is
    classifier-free guidance in logit space: two passes (conditional and
    null-label) combined as u + s·(c − u). The reference's forward_with_cfg
    (lib/networks/dit.py:486-505) guides raw eps channels and is never
    invoked by any of its samplers; logit-space guidance is the formulation
    that composes with every discrete sampler here.
    """

    module: nn.Module
    process: ForwardProcess
    cfg: Any
    has_label: bool = False
    bound_label: Optional[jnp.ndarray] = None
    cfg_scale: float = 0.0
    null_label: int = 0  # LabelEmbedder's dropped-label row (num_classes)

    # -- network ------------------------------------------------------------
    def init(self, key: jax.Array, x: jnp.ndarray, t: jnp.ndarray, label=None):
        kwargs = {"label": label} if (self.has_label and label is not None) else {}
        return self.module.init({"params": key}, x, t, **kwargs)["params"]

    def apply(
        self,
        params,
        x: jnp.ndarray,
        t: jnp.ndarray,
        label: Optional[jnp.ndarray] = None,
        train: bool = False,
        rngs: Optional[dict] = None,
        return_aux: bool = False,
    ) -> jnp.ndarray:
        """Network forward -> (B, D, S) logits.

        return_aux=True forwards to networks exposing auxiliary heads
        (SequenceTransformer.aux_key_classes) -> (logits, aux) tuple; only
        losses pass it, samplers always get plain logits.
        """
        if label is None and self.bound_label is not None:
            label = self.bound_label
        kwargs: dict = {"train": train}
        if return_aux:
            kwargs["return_aux"] = True
        if self.has_label and label is not None:
            if self.cfg_scale > 0.0:
                cond = self.module.apply(
                    {"params": params}, x, t, rngs=rngs, label=label, **kwargs
                )
                null = jnp.full_like(label, self.null_label)
                uncond = self.module.apply(
                    {"params": params}, x, t, rngs=rngs, label=null, **kwargs
                )
                return uncond + self.cfg_scale * (cond - uncond)
            kwargs["label"] = label
        return self.module.apply({"params": params}, x, t, rngs=rngs, **kwargs)

    # -- forward process passthrough (reference mixin methods) --------------
    def rate(self, t):
        return self.process.rate(t)

    def rate_mat(self, y, t):
        return self.process.rate_mat(y, t)

    def transition(self, t):
        return self.process.transition(t)

    def transit_between(self, t1, t2):
        return self.process.transit_between(t1, t2)

    @property
    def ema_decay(self) -> float:
        return float(self.cfg.model.get("ema_decay", 0.0))


def create_model(cfg) -> DiffusionModel:
    """Build the registered model named by cfg.model.name."""
    return registry.models.get(cfg.model.name)(cfg)


def compose(cfg, module: nn.Module, has_label: bool = False) -> DiffusionModel:
    return DiffusionModel(
        module=module,
        process=build_process(cfg),
        cfg=cfg,
        has_label=has_label,
    )
