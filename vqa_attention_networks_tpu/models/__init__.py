"""Model zoo: every model family of the reference, as pure JAX functions.

Each module exports
    ``init(rng, cfg) -> params``          (xavier-uniform weights, zero biases,
                                           mirroring train_models.py:54-56)
    ``apply(params, cfg, img_features, questions, ques_length=None,
            train=False, rng=None) -> (logits, aux)``

Registry keys match the reference CLI names (train_models.py:16,44-52 plus the
models its Solver/legacy trainer dispatch to).
"""

from vqa_attention_networks_tpu.models import (  # noqa: F401
    hiecoatten,
    ibowimg,
    mfb,
    mhb_coatt,
    vis_lstm,
)

_REGISTRY = {
    "mfb": mfb,
    "mfb-multilayer": mfb,
    "mhb": mhb_coatt.MHB,
    "mhb_coAtt": mhb_coatt,
    "hieCoAtten": hiecoatten,
    "visLstm": vis_lstm,
    "iBOWIMG": ibowimg.IBOWIMG,
    "attentionNet": ibowimg.ATTENTION_NET,
}


def get_model(name: str):
    """Model factory (the counterpart of train_models.py:44-52)."""
    if name not in _REGISTRY:
        raise ValueError(f"model {name!r} not supported; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
