"""Image feature-extraction CLI (counterpart of extract_image_features.py).

Batches COCO ``{split}2014`` images through the jit-compiled ResNet-152
trunk on TPU and writes ONE packed feature store per split (not 123k tiny
``.npy`` files — see data/feature_store.py). The host decodes JPEGs and
resizes to the target resolution with BILINEAR (torchvision Resize's
default, extract_image_features.py:56) on a thread pool, pipelined one
batch ahead of the device; ImageNet normalisation runs inside the jitted
graph on uint8 input.

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

    # BILINEAR, matching torchvision Resize's default interpolation — the
    # reference preprocesses with transforms.Resize((448, 448))
    # (extract_image_features.py:56); Pillow's own default is BICUBIC,
    # which would silently produce different features
    img = Image.open(path).convert("RGB").resize(
        (size, size), Image.BILINEAR
    )
    return np.asarray(img, np.uint8)


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def _image_id(name: str):
    """COCO_{split}2014_{id:012d}.jpg -> id; None for unparseable names."""
    try:
        return int(os.path.splitext(name)[0].split("_")[-1])
    except ValueError:
        return None


def _decode_chunk(pool, image_dir: str, chunk, size: int, bs: int):
    batch = np.zeros((bs, size, size, 3), np.uint8)
    futures = [
        pool.submit(_load_image, join(image_dir, name), size)
        for name in chunk
    ]
    ids = []
    for i, (name, fut) in enumerate(zip(chunk, futures)):
        batch[i] = fut.result()
        ids.append(_image_id(name))
    return batch, ids


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
    parser.add_argument("--size", type=int, default=448,
                        help="input resolution (reference: 448; the grid is "
                             "size/32 x size/32 regions)")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        help="trunk compute dtype: bfloat16 (fast) or "
                             "float32 (reference-exact features)")
    parser.add_argument("--store_dtype", type=str, default="float16",
                        help="on-disk store dtype: float16 (default) or "
                             "int8 (quantized with per-channel scales — "
                             "half the disk/host bytes, 2-4x less "
                             "host->device traffic; an existing f16 store "
                             "converts with tools/quantize_store.py)")
    args = parser.parse_args(argv)

    import functools
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    image_dir = args.image_dir or f"data/vqa/{args.split}2014"
    all_names = sorted(
        x for x in os.listdir(image_dir) if not x.startswith(".")
    )
    names = [
        x for x in all_names
        if x.lower().endswith(_IMAGE_EXTS) and _image_id(x) is not None
    ]
    skipped = len(all_names) - len(names)
    if skipped:
        print(f"WARNING: skipping {skipped} non-image / non-COCO-named "
              f"files in {image_dir}")
    print(f"total image count: {len(names)}")
    if args.size != 448:
        print(f"WARNING: --size {args.size} != 448: features will have a "
              f"{args.size // 32}x{args.size // 32} grid and will NOT match "
              "the reference's 14x14 features")

    params = jax.device_put(load_resnet_params(args.weights))
    extract = jax.jit(functools.partial(
        resnet.extract, dtype=jnp.dtype(args.dtype), size=args.size
    ))

    out_dir = join(args.output_dir, f"{args.feature_type}_{args.split}")
    bs = args.batch_size
    grid = (args.size // 32) ** 2  # ResNet downsamples 32x: 448 -> 14x14
    chunks = [names[s : s + bs] for s in range(0, len(names), bs)]
    with FeatureStoreWriter(out_dir, num_regions=grid,
                            dtype=args.store_dtype) as writer, \
            ThreadPoolExecutor(max_workers=8) as pool:
        # software pipeline: decode chunk t+1 on host threads while the
        # device runs chunk t (jax dispatch is async; the np.asarray fetch
        # is the only sync point)
        pending = None  # (device output, ids, n)
        for ci, chunk in enumerate(chunks):
            batch, ids = _decode_chunk(pool, image_dir, chunk, args.size, bs)
            dev = extract(params, batch)
            if pending is not None:
                p_dev, p_ids, p_n = pending
                writer.append_batch(p_ids, np.asarray(p_dev)[:p_n])
            pending = (dev, ids, len(chunk))
            if ci % 50 == 0:
                print(f"{ci * bs + len(chunk)}/{len(names)}", flush=True)
        if pending is not None:
            p_dev, p_ids, p_n = pending
            writer.append_batch(p_ids, np.asarray(p_dev)[:p_n])
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
