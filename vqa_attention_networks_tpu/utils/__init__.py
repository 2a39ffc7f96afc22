"""Auxiliary subsystems: timing, metric logging, checkpointing."""

from vqa_attention_networks_tpu.utils.timer import Timer  # noqa: F401
