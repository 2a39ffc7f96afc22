"""Data plane: text normalisation, offline QA preparation, packed feature
store and the batch pipeline that feeds the TPU."""

from vqa_attention_networks_tpu.data.text import normalize_words, tokenize  # noqa: F401
