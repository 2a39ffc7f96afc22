"""Offline GloVe embedding table.

The reference looks up GloVe vectors *per training item* through spaCy with a
memoisation dict inside each DataLoader worker (``data_loader.py:18-23,47-56``)
and ships a [22, 300] float matrix per sample to the device. Here the whole
vocabulary is embedded **once, offline**, into a frozen
``[q_vocab_size, 300]`` table; the model gathers rows on device (a single
``jnp.take`` riding HBM) — no per-item host work, no per-batch 5 MB transfer.

Row 0 (the pad id) is zero, matching ``data_loader.py:51-52``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

GLOVE_DIM = 300


def build_glove_table(
    question_vocab: Dict[str, int],
    dim: int = GLOVE_DIM,
    spacy_model: str = "en_vectors_web_lg",
) -> np.ndarray:
    """Embed the question vocabulary with spaCy GloVe vectors.

    Requires the spaCy model used by the reference (``data_loader.py:19``).
    Raises ImportError if spaCy / the model is unavailable — callers that only
    need *a* table (tests, smoke runs) should use ``random_glove_table``.
    """
    import spacy  # gated: not part of the baked-in environment

    nlp = spacy.load(spacy_model)
    size = max(question_vocab.values()) + 1
    table = np.zeros((size, dim), dtype=np.float32)
    for word, idx in question_vocab.items():
        table[idx] = nlp(word).vector
    table[0] = 0.0  # pad row
    return table


def random_glove_table(
    question_vocab: Dict[str, int], dim: int = GLOVE_DIM, seed: int = 0
) -> np.ndarray:
    """Deterministic random stand-in with the same contract (tests/smoke)."""
    size = max(question_vocab.values()) + 1
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((size, dim)).astype(np.float32) * 0.1
    table[0] = 0.0
    return table


def save_glove_table(table: np.ndarray, path: str) -> None:
    np.save(path, table)


def load_glove_table(path: str) -> Optional[np.ndarray]:
    try:
        return np.load(path)
    except FileNotFoundError:
        return None
