"""Shared timing harness for the TPU benchmarks.

On relayed/tunneled backends ``block_until_ready`` returns before the device
finishes and every host fetch costs a ~26 ms round trip. The device executes
dispatches in order, so the harness queues ``iters`` calls and fetches only
the LAST output — a correct barrier with one round trip.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup

# same preamble as the CLIs: VQA_PLATFORM override + persistent compile
# cache, so repeated benchmark runs skip the (relayed) TPU compile
_rt_setup()


def timeit_last(fn: Callable, *args, iters: int = 16, trials: int = 3) -> float:
    """Best-of-``trials`` seconds per iteration (compile excluded)."""
    np.asarray(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
