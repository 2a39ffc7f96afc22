"""Convert a packed f16/f32 feature store to int8 + per-channel scales.

The int8 store halves disk/host-cache bytes vs f16 and quarters them vs
f32; the training/serving feed ships int8 across host->device and
dequantises on device (train/solver.py). Per-(image, channel) symmetric
scales bound the relative error at ~1/254 of each channel's max.

    python -m tools.quantize_store --src data/resnet152_all \
        --dst data/resnet152_all_int8

Point --data_dir at the parent and rename (or re-symlink) the directory
to <feature_type>_all to serve from it; every reader works against either
dtype transparently (data/feature_store.py gather dequantises host-side
for float consumers).
"""

import argparse
import sys

from vqa_attention_networks_tpu.data.feature_store import quantize_store


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="existing f16/f32 store dir")
    p.add_argument("--dst", required=True, help="output int8 store dir")
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args(argv)
    store = quantize_store(args.src, args.dst, batch=args.batch)
    print(f"quantized {len(store)} images "
          f"[{store.num_regions}x{store.channels}] -> {args.dst} (int8)")


if __name__ == "__main__":
    sys.exit(main())
