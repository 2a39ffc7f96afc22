"""Training/eval driver: losses, metrics and the Solver loop."""

from vqa_attention_networks_tpu.train.losses import (  # noqa: F401
    cross_entropy,
    soft_cross_entropy,
)
from vqa_attention_networks_tpu.train.solver import Solver  # noqa: F401
