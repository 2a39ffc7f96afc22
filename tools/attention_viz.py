"""Render attention maps dumped by ``cli.predict --dump_attention``.

Produces one PNG: the input image with the 196-region (14x14) visual
attention map overlaid as a heatmap, plus a bar chart of the per-word
question attention when the dump carries one (hieCoAtten ``aq``).

The reference returns these maps from its forward pass
(hieCoAtten.py:55) but ships no way to look at them; this closes the loop:

    python -m vqa_attention_networks_tpu.cli.predict \
        --image_path cat.jpg --question "what is this" \
        --model_name hieCoAtten --dump_attention att.npz
    python tools/attention_viz.py --image cat.jpg --attention att.npz \
        --question "what is this" --out att.png

Map keys handled: ``av``/``aq`` (hieCoAtten region/word maps) and
``q_att_logits``/``co_att_logits`` (mfb glimpse logits — softmaxed here,
one panel per glimpse).
"""

from __future__ import annotations

import argparse

import numpy as np

GRID = 14  # 14x14 = 196 regions (cfg.img_feature_dim)


def _softmax(x: np.ndarray, axis: int = 0) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def region_maps(maps: dict) -> list:
    """[(title, [196] normalised region weights)] from a dump's keys."""
    out = []
    if "av" in maps:
        out.append(("visual attention", np.asarray(maps["av"], np.float64)))
    if "co_att_logits" in maps:  # [196, n_glimpse] logits
        logits = np.asarray(maps["co_att_logits"], np.float64)
        # honesty flag written by cli.predict: under the preserved
        # reference quirk mfb POOLS UNIFORMLY — the logits are what the
        # attention submodule computed, not the applied pooling weights
        quirk = bool(maps.get("uniform_quirk", False))
        tag = " — POOLED UNIFORMLY (quirk); logits shown" if quirk else ""
        for g in range(logits.shape[-1]):
            out.append((f"glimpse {g}{tag}", _softmax(logits[:, g])))
    return out


def word_weights(maps: dict, n_words: int):
    """[n_words] question-attention weights, or None."""
    if "aq" in maps:
        return np.asarray(maps["aq"], np.float64)[:n_words]
    if "q_att_logits" in maps:  # [T, n_glimpse] — average the glimpses
        logits = np.asarray(maps["q_att_logits"], np.float64)
        return _softmax(logits, axis=0).mean(axis=-1)[:n_words]
    return None


def render(image_path: str, maps: dict, question: str, out: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    img = np.asarray(Image.open(image_path).convert("RGB"))
    regions = region_maps(maps)
    if not regions:
        raise SystemExit(
            f"no region attention in {sorted(maps)} — nothing to render"
        )
    words = question.split()
    wq = word_weights(maps, len(words)) if words else None
    if wq is not None and len(words) > len(wq):
        # the model truncates questions at max_question_length; mirror that
        words = words[: len(wq)]

    n_panels = len(regions) + (1 if wq is not None else 0)
    fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 4))
    axes = np.atleast_1d(axes)

    for ax, (title, w) in zip(axes, regions):
        ax.imshow(img)
        heat = w.reshape(GRID, GRID)
        # upsample by extent: imshow stretches the 14x14 grid over the image
        ax.imshow(heat, cmap="inferno", alpha=0.45,
                  extent=(0, img.shape[1], img.shape[0], 0))
        ax.set_title(title)
        ax.axis("off")

    if wq is not None:
        ax = axes[-1]
        ax.bar(range(len(words)), wq[: len(words)])
        ax.set_xticks(range(len(words)))
        ax.set_xticklabels(words, rotation=45, ha="right")
        ax.set_title("question attention")

    fig.suptitle(question)
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"wrote {out} ({n_panels} panel(s))")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--attention", type=str, required=True,
                        help=".npz from cli.predict --dump_attention")
    parser.add_argument("--question", type=str, default="")
    parser.add_argument("--out", type=str, default="attention.png")
    args = parser.parse_args(argv)
    maps = dict(np.load(args.attention))
    render(args.image, maps, args.question, args.out)


if __name__ == "__main__":
    main()
