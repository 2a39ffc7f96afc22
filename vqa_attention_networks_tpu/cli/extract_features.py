"""Image feature-extraction CLI (counterpart of extract_image_features.py).

Batches COCO ``{split}2014`` images through the jit-compiled ResNet-152
trunk on TPU and writes ONE packed feature store per split (not 123k tiny
``.npy`` files — see data/feature_store.py). Preprocessing (resize 448 +
ImageNet normalise) runs inside the jitted graph; the host only decodes
JPEGs and ships uint8.

Pretrained weights: pass ``--weights`` pointing at a ``.npz`` produced by
``convert-weights`` below (torchvision resnet152 state_dict -> numpy). The
published accuracies depend on these exact features
(extract_image_features.py:22); without weights a random trunk is used and a
loud warning printed (pipeline testing only).
"""

import argparse
import os
from os.path import join

import jax
import numpy as np

from vqa_attention_networks_tpu.data.feature_store import FeatureStoreWriter
from vqa_attention_networks_tpu.models import resnet


def load_resnet_params(weights_path=None):
    if weights_path:
        raw = dict(np.load(weights_path))
        return resnet.convert_torchvision_resnet152(raw)
    print("WARNING: no --weights given; using a RANDOM ResNet-152 trunk. "
          "Features will not match the reference's pretrained features.")
    return resnet.random_init(jax.random.PRNGKey(0))


def _load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size))
    return np.asarray(img, np.uint8)


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser(description="extract image features")
    parser.add_argument("--split", type=str, default="train", help="train|val")
    parser.add_argument("--output_dir", type=str, default="data")
    # measured sweet spot on v5e: 1269 img/s at 32 vs 1164 at 64 / 879 at 8
    # (benchmarks/bench_extract.py)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--feature_type", type=str, default="resnet152")
    parser.add_argument("--image_dir", type=str, default=None,
                        help="defaults to data/vqa/{split}2014")
    parser.add_argument("--weights", type=str, default=None,
                        help=".npz of torchvision resnet152 state_dict")
    parser.add_argument("--size", type=int, default=448)
    args = parser.parse_args(argv)

    image_dir = args.image_dir or f"data/vqa/{args.split}2014"
    names = sorted(
        x for x in os.listdir(image_dir) if not x.startswith(".")
    )
    print(f"total image count: {len(names)}")

    params = jax.device_put(load_resnet_params(args.weights))
    extract = jax.jit(resnet.extract)

    out_dir = join(args.output_dir, f"{args.feature_type}_{args.split}")
    bs = args.batch_size
    with FeatureStoreWriter(out_dir) as writer:
        for start in range(0, len(names), bs):
            chunk = names[start : start + bs]
            batch = np.zeros((bs, args.size, args.size, 3), np.uint8)
            ids = []
            for i, name in enumerate(chunk):
                batch[i] = _load_image(join(image_dir, name), args.size)
                # COCO_{split}2014_{id:012d}.jpg -> image id
                ids.append(int(os.path.splitext(name)[0].split("_")[-1]))
            feats = np.asarray(extract(params, batch))[: len(chunk)]
            writer.append_batch(ids, feats)
            if (start // bs) % 50 == 0:
                print(f"{start + len(chunk)}/{len(names)}")
    print(f"wrote packed feature store to {out_dir}")


def convert_weights(argv=None) -> None:
    """Offline: torch .pth state_dict -> .npz of numpy arrays."""
    parser = argparse.ArgumentParser()
    parser.add_argument("pth")
    parser.add_argument("npz")
    args = parser.parse_args(argv)
    import torch

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    np.savez(args.npz, **{k: v.numpy() for k, v in sd.items()})
    print(f"converted {len(sd)} tensors -> {args.npz}")


if __name__ == "__main__":
    main()
