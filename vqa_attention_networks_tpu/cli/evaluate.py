"""Standalone evaluation CLI.

Counterpart of ``train_models.py --mode testing`` (train_models.py:68-71) and
of the metric contract the reference's TF eval script defines — full-split
accuracy AND top-3 accuracy (evaluate_tf.py:63-76). Results land in
``results/<model>.txt`` (reference format, solver.py:179-182) plus a JSON
sidecar with the exact-denominator and top-3 numbers.
"""

from vqa_attention_networks_tpu.cli.train import main as _train_main


def main(argv=None) -> None:
    # (runtime setup happens inside _train_main)
    if argv is None:
        import sys

        argv = sys.argv[1:]
    argv = list(argv)
    # token-wise: a substring check would false-match --model_name and run
    # a full TRAINING (overwriting the weights being evaluated)
    has_mode = any(a == "--mode" or a.startswith("--mode=") for a in argv)
    if not has_mode:
        argv = argv + ["--mode", "testing"]
    _train_main(argv)


if __name__ == "__main__":
    main()
