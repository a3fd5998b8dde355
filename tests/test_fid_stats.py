"""Smoke test for scripts/fid_stats.py (seed-replicated FID statistics).

Drives the CLI end-to-end on a shrunken flagship config against a synthetic
checkpoint: asserts floor / noise-anchor / per-seed / aggregate records land
with finite values and that the floor is below the noise anchor.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_fid_stats_cli(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import fid_stats

    from ctdd_tpu.config.presets import get_preset
    from ctdd_tpu.models.base import create_model
    from ctdd_tpu.training.optimizers import get_optimizer
    from ctdd_tpu.training.state import create_train_state
    from ctdd_tpu.utils.bookkeeping import CheckpointManager

    sets = [
        "model.ch=8",
        "model.num_res_blocks=1",
        "model.time_embed_dim=8",
        "sampler.num_steps=4",
        "sampler.num_corrector_steps=0",
    ]
    cfg = get_preset("tauUnet_mnist")
    for kv in sets:
        k, v = kv.split("=")
        node = cfg
        parts = k.split(".")
        for part in parts[:-1]:
            node = getattr(node, part)
        setattr(node, parts[-1], type(getattr(node, parts[-1]))(eval(v)))

    model = create_model(cfg)
    D = cfg.model.concat_dim
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, D), jnp.int32), jnp.full((2,), 0.5)
    )
    state = create_train_state(params, get_optimizer(cfg))
    snapdir = tmp_path / "snaps"
    CheckpointManager(str(snapdir)).save(7, state, force=True)

    out = tmp_path / "out"
    argv = [
        "fid_stats.py", "--preset", "tauUnet_mnist",
        "--snapshots", str(snapdir), "--samples", "16", "--batch", "16",
        "--seeds", "2", "--samplers", "TauL", "--features", "lenet",
        "--out", str(out), "--set", *sets,
    ]
    monkeypatch.setattr(sys, "argv", argv)
    fid_stats.main()

    recs = [
        json.loads(line)
        for line in open(out / "fid_stats.jsonl")
    ]
    kinds = {r["kind"] for r in recs}
    assert {"floor_split", "noise_anchor", "model", "model_agg"} <= kinds
    floor = next(r for r in recs if r["kind"] == "floor_split")
    noise = next(r for r in recs if r["kind"] == "noise_anchor")
    agg = next(r for r in recs if r["kind"] == "model_agg")
    assert floor["fid_mean"] < noise["fid"]
    assert agg["n_seeds"] == 2
    per_seed = [r for r in recs if r["kind"] == "model"]
    assert len(per_seed) == 2 and all(
        r["fid"] >= 0 and r["n_samples"] == 16 for r in per_seed
    )

    # Rerun with --skip-done (the default): every cell is already in the
    # jsonl, so nothing is recomputed or re-emitted (timeout-recovery path).
    n_before = len(recs)
    fid_stats.main()
    recs2 = [json.loads(line) for line in open(out / "fid_stats.jsonl")]
    assert len(recs2) == n_before

    # A fresh seed count forces only the missing cells: seeds=3 adds one
    # model record + a re-aggregated model_agg, and leaves floor/noise alone.
    argv3 = [a if a != "2" else "3" for a in argv]
    monkeypatch.setattr(sys, "argv", argv3)
    fid_stats.main()
    recs3 = [json.loads(line) for line in open(out / "fid_stats.jsonl")]
    assert len([r for r in recs3 if r["kind"] == "model"]) == 3
    assert len([r for r in recs3 if r["kind"] == "floor_split"]) == 1
    assert len([r for r in recs3 if r["kind"] == "noise_anchor"]) == 1
    aggs = [r for r in recs3 if r["kind"] == "model_agg"]
    assert aggs[-1]["n_seeds"] == 3
