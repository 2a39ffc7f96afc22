"""Worker for the real multi-process distributed test (test_multiprocess.py).

Runs as ONE process of a gloo-backed CPU cluster: initialises the
multi-host runtime through the framework's own wrapper
(parallel/distributed.initialize_distributed), builds the global
('data', 'model') mesh over devices spanning BOTH processes, computes a
data-parallel loss+grad step where each process contributes only its local
shard of the batch, and writes the result for the parent to compare against
a single-process ground truth.

Not collected by pytest (leading underscore). Invoked as:
    python tests/_mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

# pure-CPU worker: drop any TPU plugin dirs inherited via sys.path
sys.path = [p for p in sys.path if "axon" not in p]
os.environ["JAX_PLATFORMS"] = "cpu"

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_cpu_enable_async_dispatch", False)

from vqa_attention_networks_tpu.parallel.distributed import (
    initialize_distributed,
    is_primary,
)

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert is_primary() == (pid == 0)

import jax.numpy as jnp

from tests._mp_case import make_case
from vqa_attention_networks_tpu.parallel import shard_batch, shard_params

case = make_case()
mesh = case["mesh_fn"]()  # global mesh over all 2*nproc devices

# the REAL framework path: every host holds the same (deterministic) global
# batch; shard_batch feeds this process's slice, shard_params replicates
global_batch = shard_batch(mesh, case["batch"])
params = shard_params(mesh, case["params"], fusion_dim=None)

loss, grads = case["grad_fn"](params, *global_batch)
fingerprint = float(
    sum(jnp.sum(jnp.abs(g)).astype(jnp.float64)
        for g in jax.tree_util.tree_leaves(grads))
)
out = {"pid": pid, "loss": float(loss), "grad_l1": fingerprint}

# ---- multi-host checkpoint/metrics discipline (solver.py:129-130,466) ----
# one SGD-flavoured update so the saved state differs from init, then a
# COLLECTIVE orbax save into the shared dir, restore, and compare
from vqa_attention_networks_tpu.utils import checkpoint as ckpt
from vqa_attention_networks_tpu.utils.logging import (
    MetricWriter,
    NullMetricWriter,
)

params_new = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g, params, grads)
state = {"params": params_new, "step": jnp.asarray(1)}
ckpt_dir = os.path.join(outdir, "shared_ckpt")
ckpt.save_checkpoint(ckpt_dir, state, step=1, keep=1)

restored = ckpt.restore_checkpoint(ckpt_dir, state, step=1)


def _l1(tree):
    return float(
        sum(jnp.sum(jnp.abs(x)).astype(jnp.float64)
            for x in jax.tree_util.tree_leaves(tree))
    )


out["saved_l1"] = _l1(params_new)
out["restored_l1"] = _l1(restored["params"])
out["restored_step"] = int(restored["step"])

# primary-only metric writing, exactly the Solver's gating (solver.py:129)
writer = (
    MetricWriter(os.path.join(outdir, "runs"), run_name="mp")
    if is_primary() else NullMetricWriter()
)
writer.add_scalars("mp/loss", {"train": float(loss)}, step=1)
writer.close()

with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
    json.dump(out, f)
print(f"worker {pid}: {out}", flush=True)
