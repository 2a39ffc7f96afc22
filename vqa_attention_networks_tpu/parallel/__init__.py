"""SPMD parallelism: device meshes + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(solver.py:34-36) plus 4 DataLoader worker processes (cfg.py:6). Here scaling
is expressed the TPU way (SURVEY.md section 2.3):

- a ``jax.sharding.Mesh`` with ``('data', 'model')`` axes;
- batch arrays sharded over ``data`` (DP) — XLA emits the gradient
  all-reduce over ICI from the ``jit`` partitioning, no NCCL-style code;
- the wide MFB/MHB factor projections (the 5000-dim axis) sharded over
  ``model`` (TP), so tensor parallelism is a mesh-shape change, not a
  rewrite;
- multi-host runs extend the same mesh over DCN via
  ``jax.distributed.initialize`` (no other code changes).

Pipeline/sequence/expert parallelism are structurally unnecessary at this
model scale (fixed 22-token questions, 196-region grids, <50M params —
SURVEY.md section 2.3) but sequence axes are named so sharding them later is
a rule change.
"""

from vqa_attention_networks_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
)
from vqa_attention_networks_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    place_global,
    shard_batch,
    shard_params,
)
