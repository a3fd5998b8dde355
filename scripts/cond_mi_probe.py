"""How much prefix->suffix information does the conditional task carry?

Pure-numpy estimate on the pianoroll stand-in (data/pianoroll.py): compares
the suffix-token unigram entropy H(x) against the entropy conditioned on
progressively more prefix-derivable context:

  1. H(x)                      — what a prefix-ignoring (marginal) model pays
  2. H(x | key(prefix))        — key is exactly recoverable from the prefix
  3. H(x | key, register bin)  — register (octave band) also persists
  4. H(x | previous token)     — in-suffix bigram, the strongest cheap model
     (beat=4 sustain repeats tokens); NOT prefix info, shown for scale

The gap 1-2 (and 1-3) lower-bounds the per-token mutual information a
conditional denoiser could extract from the prefix at t->0. The decode probe
(scripts/cond_decode_probe.py) measures what the trained model actually
extracts (CE_shufpfx - CE); this script establishes the ceiling it is
measured against. Context: docs/DESIGN_NOTES.md "the conditional all-rest
collapse". Reference conditional stack: TAUnSDDM losses.py:547-781 (no
published conditional quality number to compare).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def entropy_from_counts(counts: np.ndarray) -> float:
    """Shannon entropy (nats) of a count vector."""
    p = counts / counts.sum()
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def cond_entropy(tokens: np.ndarray, groups: np.ndarray, vocab: int) -> float:
    """H(token | group), tokens/groups flat int arrays of equal length."""
    h, n = 0.0, len(tokens)
    for g in np.unique(groups):
        sel = tokens[groups == g]
        counts = np.bincount(sel, minlength=vocab)
        h += (len(sel) / n) * entropy_from_counts(counts)
    return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--cond-dim", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ctdd_tpu.data.pianoroll import REST, generate_standin, infer_key

    seqs = generate_standin(args.n, seed=args.seed)
    vocab = REST + 1
    prefix, suffix = seqs[:, : args.cond_dim], seqs[:, args.cond_dim :]
    key = infer_key(prefix)

    # register bin: mean non-rest prefix pitch, bucketed per octave
    notes = np.where(prefix >= REST, np.nan, prefix.astype(float))
    reg = np.nanmean(notes, axis=1)
    reg = np.nan_to_num(reg, nan=60.0)
    reg_bin = np.clip((reg // 12).astype(int), 0, 10)

    toks = suffix.ravel()
    rows = np.repeat(np.arange(args.n), suffix.shape[1])

    h_marg = entropy_from_counts(np.bincount(toks, minlength=vocab))
    h_key = cond_entropy(toks, key[rows], vocab)
    h_keyreg = cond_entropy(toks, (key * 16 + reg_bin)[rows], vocab)
    prev = seqs[:, args.cond_dim - 1 : -1].ravel()  # in-suffix bigram
    h_bigram = cond_entropy(toks, prev, vocab)

    print(f"n={args.n} cond_dim={args.cond_dim} suffix tokens={len(toks)}")
    print(f"H(x)                 = {h_marg:.4f} nats  (marginal model CE floor)")
    print(f"H(x | key)           = {h_key:.4f} nats  (prefix MI >= {h_marg - h_key:.4f})")
    print(f"H(x | key, register) = {h_keyreg:.4f} nats  (prefix MI >= {h_marg - h_keyreg:.4f})")
    print(f"H(x | prev token)    = {h_bigram:.4f} nats  (in-suffix bigram, for scale)")
    print(
        "verdict: the prefix carries "
        f"{h_marg - h_keyreg:.3f}+ nats/token the collapsed denoiser leaves unused"
        if h_marg - h_keyreg > 0.05
        else "verdict: prefix carries negligible information — marginal reversion is near-optimal"
    )


if __name__ == "__main__":
    main()
