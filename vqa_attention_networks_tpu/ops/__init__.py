"""Compute kernels for the VQA hot paths.

Two implementations per op:

- ``fusion.py``: XLA-composed reference semantics (always available, fully
  differentiable, used as the numerical oracle).
- ``pallas_fusion.py``: hand-fused Pallas TPU kernels for the
  projection->Hadamard->sum-pool->signed-sqrt chain and the glimpse-attention
  block, selected via ``use_pallas()`` on TPU backends.

The reference has no native kernels of its own — its hot ops run through
cuDNN/cuBLAS implicitly (SURVEY.md section 2.2); these kernels are the
TPU-native equivalent layer.
"""

from vqa_attention_networks_tpu.ops.fusion import (  # noqa: F401
    mfb_fuse_pool,
    mfb_sumpool,
    two_glimpse_pool,
)
