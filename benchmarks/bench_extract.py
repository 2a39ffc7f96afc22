"""Offline feature-extraction throughput: jitted ResNet-152 at 448².

Usage: python benchmarks/bench_extract.py [--batch 8] [--weights w.npz]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import timeit_last
from vqa_attention_networks_tpu.models import resnet


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--weights", type=str, default=None)
    args = parser.parse_args(argv)

    if args.weights:
        params = resnet.convert_torchvision_resnet152(
            dict(np.load(args.weights))
        )
    else:
        params = resnet.random_init(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    # time the pure device forward: ship the batch once (host->device feed
    # is pipeline-overlapped in the real extraction CLI)
    imgs = jax.device_put(
        jnp.zeros((args.batch, 448, 448, 3), jnp.float32)
    )

    @jax.jit
    def fwd(p, x):
        return resnet.apply(p, x).sum()

    best = timeit_last(fwd, params, imgs, iters=8)
    print(f"ResNet-152 448px batch={args.batch}: {best * 1000:.1f} ms -> "
          f"{args.batch / best:.0f} images/s")


if __name__ == "__main__":
    main()
