"""Model zoo: every model family of the reference, as pure JAX functions.

Each module exports
    ``init(rng, cfg) -> params``          (xavier-uniform weights, zero biases,
                                           mirroring train_models.py:54-56)
    ``apply(params, cfg, img_features, questions, ques_length=None,
            train=False, rng=None) -> (logits, aux)``

Registry keys match the reference CLI names (train_models.py:16,44-52 plus the
models its Solver/legacy trainer dispatch to). Resolution is lazy so that
``ops``/``models`` stay import-cycle-free.
"""

import importlib

_REGISTRY = {
    "mfb": ("vqa_attention_networks_tpu.models.mfb", None),
    "mfb-multilayer": ("vqa_attention_networks_tpu.models.mfb", None),
    "mhb": ("vqa_attention_networks_tpu.models.mhb_coatt", "MHB"),
    "mhb_coAtt": ("vqa_attention_networks_tpu.models.mhb_coatt", None),
    "hieCoAtten": ("vqa_attention_networks_tpu.models.hiecoatten", None),
    "visLstm": ("vqa_attention_networks_tpu.models.vis_lstm", None),
    "iBOWIMG": ("vqa_attention_networks_tpu.models.ibowimg", "IBOWIMG"),
    "attentionNet": ("vqa_attention_networks_tpu.models.ibowimg",
                     "ATTENTION_NET"),
}


def get_model(name: str):
    """Model factory (the counterpart of train_models.py:44-52)."""
    if name not in _REGISTRY:
        raise ValueError(f"model {name!r} not supported; have {sorted(_REGISTRY)}")
    module_name, attr = _REGISTRY[name]
    module = importlib.import_module(module_name)
    return getattr(module, attr) if attr else module


def __getattr__(name):
    # lazy submodule access: models.mhb_coatt etc.
    if name in ("mfb", "mhb_coatt", "hiecoatten", "vis_lstm", "ibowimg",
                "layers", "resnet", "vgg"):
        return importlib.import_module(f"vqa_attention_networks_tpu.models.{name}")
    raise AttributeError(name)
