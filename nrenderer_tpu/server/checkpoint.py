"""Render checkpoint / resume.

The reference has NO checkpointing: renders are all-or-nothing with the film
posted once at the end (SURVEY.md §5.4).  The rebuild checkpoints the linear
film accumulator + the sample counter + the PRNG position, so an interrupted
render resumes exactly where it stopped (same estimator: the film is a sum of
independent per-chunk estimates keyed by chunk index).

Format: a single .npz with {film (n_pix, 3) f32 linear sums, spp_done,
width, height, seed, fingerprint} — the fingerprint guards against resuming
onto a different scene/config.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def save_checkpoint(path: str, film: np.ndarray, spp_done: int, width: int,
                    height: int, seed: int, fingerprint: str) -> None:
    tmp = path + ".tmp"
    np.savez(tmp if not tmp.endswith(".npz") else tmp,
             film=np.asarray(film, np.float32),
             spp_done=np.int64(spp_done), width=np.int64(width),
             height=np.int64(height), seed=np.int64(seed),
             fingerprint=np.bytes_(fingerprint.encode()))
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_checkpoint(path: str, fingerprint: str
                    ) -> Optional[Tuple[np.ndarray, int]]:
    """Returns (film, spp_done) if the checkpoint exists and matches the
    scene/config fingerprint; None otherwise."""
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
    except (OSError, ValueError):
        return None
    stored = bytes(data["fingerprint"]).decode(errors="replace")
    if stored != fingerprint:
        return None
    return np.asarray(data["film"], np.float32), int(data["spp_done"])
