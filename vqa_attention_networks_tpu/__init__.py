"""vqa_attention_networks_tpu — a TPU-native (JAX / XLA / Pallas / pjit) VQA framework.

A from-scratch re-design of the capabilities of klory/vqa-attention-networks
(reference mounted read-only at /root/reference) for TPU hardware:

- Models are pure functions (``init(rng, cfg) -> params``,
  ``apply(params, cfg, ...) -> logits``) over explicit parameter pytrees,
  jit-compiled end to end.
- The fusion/attention hot paths ship as fused Pallas TPU kernels with
  XLA-composed fallbacks (``ops/``).
- Scaling is expressed through ``jax.sharding.Mesh`` + NamedSharding
  (``parallel/``): the batch rides a ``data`` axis, the wide MFB/MHB factor
  projections ride a ``model`` axis, and XLA inserts the ICI collectives.
- The data plane (``data/``) replaces the reference's per-item ``.npy`` +
  spaCy loading (reference ``data_loader.py:27-57``) with a packed,
  memory-mappable feature store and an offline GloVe table.

Reference component inventory and layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from vqa_attention_networks_tpu.config import Config  # noqa: F401
