"""Orbax checkpointing of ``{params, opt_state, step}``.

A capability upgrade over the reference, which only writes final weights
(``torch.save`` at solver.py:184-190), keeps its best model in RAM
(solver.py:62,165) and cannot resume mid-training. Here every checkpoint
carries optimiser state and the step counter, so training resumes exactly;
this is also the failure-recovery story (SURVEY.md section 5).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _globalize(tree: Any) -> Any:
    """Multi-process safety: host-local array leaves become global arrays.

    The train state mixes globally-sharded params with host-local scalars
    (step counter, early-stop state). Orbax's collective save rejects
    host-local ``jax.Array`` leaves in a multi-process run ("Cannot
    serialize host local jax.Array"), so those leaves — identical on every
    host by construction — are converted to fully-replicated global arrays
    before save/restore. Single-process: identity.
    """
    if jax.process_count() == 1:
        return tree
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec

    mesh = Mesh(np.asarray(jax.devices()), ("_replica",))

    def fix(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, PartitionSpec()
            )
        return x

    return jax.tree_util.tree_map(fix, tree)


def _step_dir(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step}")


def save_checkpoint(
    directory: str, state: Any, step: int, keep: Optional[int] = None
) -> str:
    """Write one checkpoint; returns its path.

    ``keep`` bounds retention: older ``step_*`` directories beyond the
    newest ``keep`` are deleted after a successful write (an 18-epoch
    reference run at the default 2000-step cadence would otherwise
    accumulate ~90 full {params, opt_state} snapshots). ``None`` keeps all.
    """
    path = _step_dir(directory, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _globalize(state), force=True)
    # the SAVE is collective (all hosts participate); the DELETION is not —
    # on a shared filesystem every host racing the same rmtree can leave a
    # partially-deleted step dir that later fails restore, so only the
    # primary host prunes
    from vqa_attention_networks_tpu.parallel.distributed import is_primary

    if keep is not None and keep > 0 and is_primary():
        for old in all_steps(directory)[:-keep]:
            shutil.rmtree(_step_dir(directory, old), ignore_errors=True)
    return path


def all_steps(directory: str) -> List[int]:
    """Ascending step numbers of every checkpoint under ``directory``."""
    try:
        entries = os.listdir(directory)
    except FileNotFoundError:
        return []
    return sorted(
        int(m.group(1)) for e in entries if (m := _STEP_RE.match(e))
    )


def latest_step(directory: str) -> Optional[int]:
    steps = all_steps(directory)
    return steps[-1] if steps else None


def restore_checkpoint(
    directory: str, template: Any, step: Optional[int] = None
) -> Any:
    """Restore the given (or latest) step. ``template`` is a pytree with the
    target structure/shapes/dtypes (concrete arrays are fine)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, _globalize(template)
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_step_dir(directory, step), abstract)


def save_weights(directory: str, params: Any) -> str:
    """Weights-only export (the analog of the reference's final ``.pth``,
    solver.py:184-190) — what the predict/serve paths load."""
    path = os.path.join(os.path.abspath(directory), "weights")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _globalize(params), force=True)
    return path


def load_weights(directory: str, template: Any) -> Any:
    path = os.path.join(os.path.abspath(directory), "weights")
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, _globalize(template)
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
