"""Pianoroll sequences: stand-in generator + conditional-quality metrics.

The reference's LakhPianoroll dataset (ref mnist.py:90-103) is a (N, 256)
int array with S=129 (MIDI pitches 0..127 plus 128 = rest), used by its
conditional stack (CondCTElbo, ConditionalTauLeaping, the
ConditionalDenoisingNoteSeq logger). The real Lakh npy artifact cannot be
fetched on a zero-egress box, so `generate_standin` produces a
shape/dtype/vocabulary-exact stand-in with *real* prefix->suffix structure:
each sequence commits to a musical key (one of 12 major scales) and a
register, and a scale-degree random walk with rests/sustains generates the
notes. Conditioning a model on the 32-token prefix is therefore genuinely
informative about the suffix (key + register persist), which makes
conditional generation measurable:

- `infer_key(prefix)` recovers the scale from prefix pitch classes;
- `scale_consistency(seqs, cond_dim)` scores the fraction of suffix notes
  that stay in the key inferred from the prefix alone — ~1.0 for ground
  truth, ~0.55-0.65 for suffixes from a random other key (the chance a
  random major-scale note lands in another major scale).

PARITY-GAP: numbers computed on the stand-in are NOT comparable to results
on the real Lakh data; drop `data/pianoroll/train.npy` in to reproduce the
reference protocol exactly.
"""

from __future__ import annotations

import numpy as np

REST = 128
_MAJOR = np.array([0, 2, 4, 5, 7, 9, 11])


def _scale_pitches(key: int, lo: int = 24, hi: int = 104) -> np.ndarray:
    """All MIDI pitches of the major scale `key` within [lo, hi]."""
    pcs = (_MAJOR + key) % 12
    pitches = np.arange(lo, hi + 1)
    return pitches[np.isin(pitches % 12, pcs)]


def generate_standin(
    n: int, length: int = 256, seed: int = 0,
    beat: int = 4, rest_prob: float = 0.10, leap_prob: float = 0.12,
) -> np.ndarray:
    """(n, length) int32 stand-in pianoroll, vocabulary 0..128.

    Per sequence: key ~ U(12), register center ~ U(48, 72); a scale-degree
    walk emits one token per `beat` steps (sustained notes repeat their
    token), with rests at `rest_prob` and leaps of 4-7 scale degrees at
    `leap_prob` (otherwise steps of 0-2 degrees).
    """
    rng = np.random.default_rng(seed)
    n_beats = (length + beat - 1) // beat
    out = np.empty((n, length), np.int32)
    for i in range(n):
        key = int(rng.integers(12))
        pitches = _scale_pitches(key)
        center = int(rng.integers(48, 73))
        deg = int(np.argmin(np.abs(pitches - center)))
        toks = np.empty(n_beats, np.int32)
        for b in range(n_beats):
            if rng.random() < rest_prob:
                toks[b] = REST
                continue
            if rng.random() < leap_prob:
                move = int(rng.integers(4, 8))
            else:
                move = int(rng.integers(0, 3))
            sign = -1 if rng.random() < 0.5 else 1
            # soft pull back toward the register center
            if abs(pitches[deg] - center) > 12:
                sign = 1 if pitches[deg] < center else -1
            deg = int(np.clip(deg + sign * move, 0, len(pitches) - 1))
            toks[b] = pitches[deg]
        out[i] = np.repeat(toks, beat)[:length]
    return out


def scale_membership() -> np.ndarray:
    """(12, 12) bool: membership[key, pc] = pitch-class pc is in major key."""
    member = np.zeros((12, 12), bool)
    for key in range(12):
        member[key, (_MAJOR + key) % 12] = True
    return member


def infer_key_jnp(prefix):
    """jax.numpy twin of `infer_key` for on-device aux-loss labels.

    prefix: (B, L_p) int array (traced ok). Returns (B,) int32 key indices.
    Ties break toward the lowest key index, matching numpy argmax.
    """
    import jax
    import jax.numpy as jnp

    member = jnp.asarray(scale_membership(), jnp.float32)  # (12, 12)
    pc = jnp.where(prefix >= REST, 0, prefix % 12)
    valid = (prefix < REST).astype(jnp.float32)  # rests don't vote
    onehot_pc = jax.nn.one_hot(pc, 12) * valid[..., None]  # (B, L, 12)
    scores = jnp.einsum("blp,kp->bk", onehot_pc, member)
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


def infer_key(prefix: np.ndarray) -> np.ndarray:
    """Most-compatible major key per row from prefix notes.

    prefix: (N, L_p) ints. Returns (N,) key indices 0..11 maximizing the
    count of non-rest prefix pitch classes inside that key's scale.
    """
    prefix = np.asarray(prefix)
    notes = np.where(prefix >= REST, -1, prefix % 12)  # -1 = rest/invalid
    scores = np.zeros((prefix.shape[0], 12), np.int32)
    for key in range(12):
        pcs = (_MAJOR + key) % 12
        scores[:, key] = (np.isin(notes, pcs) & (notes >= 0)).sum(axis=1)
    return np.argmax(scores, axis=1)


def scale_consistency(seqs: np.ndarray, cond_dim: int) -> float:
    """Mean fraction of suffix notes inside the key inferred from the prefix.

    The direct conditional-generation metric on the stand-in: ground truth
    scores ~1.0 (key persists across the whole sequence); a model that
    ignores its conditioner scores the cross-key collision rate (~0.55-0.65).
    Rows whose suffix is all rests are skipped.
    """
    seqs = np.asarray(seqs)
    keys = infer_key(seqs[:, :cond_dim])
    suffix = seqs[:, cond_dim:]
    notes = np.where(suffix >= REST, -1, suffix % 12)
    in_scale = np.zeros(suffix.shape, bool)
    for key in range(12):
        rows = keys == key
        if rows.any():
            pcs = (_MAJOR + key) % 12
            in_scale[rows] = np.isin(notes[rows], pcs)
    valid = notes >= 0
    counts = valid.sum(axis=1)
    ok = counts > 0
    if not ok.any():
        return float("nan")
    frac = (in_scale & valid).sum(axis=1)[ok] / counts[ok]
    return float(frac.mean())
