"""Worker for the multi-process full-eval parity test (test_multiprocess.py).

One process of a gloo-backed CPU cluster: builds the framework Solver over
a global 4-device mesh (2 CPU devices per process) on the shared synthetic
case (tests/_mp_case.make_eval_solver) and runs ``val(full=True)`` — the
path that computes the official VQA consensus / per-answer-type /
perQuestionType metrics host-side and exports the submission JSON. The
per-sample preds of every eval batch are process-sharded, so this
exercises parallel/distributed.host_fetch (the multihost allgather) and
the primary-only results write.

Not collected by pytest (leading underscore). Invoked as:
    python tests/_mp_eval_worker.py <pid> <nproc> <port> <outdir>
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
# optional: val-split size (a non-multiple of the batch size exercises the
# padded final batch across the process-sharded mesh)
n_val = int(sys.argv[5]) if len(sys.argv) > 5 else 24
# optional: feature-feed mode — host | bank | bank_shard. The bank modes
# exercise the device feature bank's multi-process placement
# (parallel/sharding.place_global: remote shards are non-addressable, so a
# bare device_put would fail here) and, for bank_shard, the ppermute ring
# gather across real OS processes.
feed = sys.argv[6] if len(sys.argv) > 6 else "host"

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
assert is_primary() == (pid == 0)

from tests._mp_case import make_eval_solver

solver = make_eval_solver(
    outdir, store_sub=f"store_p{pid}", results_sub="mp",
    data_axis=2 * nproc, n_val=n_val,
    device_feature_bank=feed in ("bank", "bank_shard"),
    device_feature_bank_shard=feed == "bank_shard",
)
loss, acc = solver.val(full=True)
solver.close()

with open(os.path.join(outdir, f"proc{pid}_eval.json"), "w") as f:
    json.dump({"pid": pid, "loss": float(loss), "acc": float(acc)}, f)
print(f"eval worker {pid}: loss={loss} acc={acc}", flush=True)
