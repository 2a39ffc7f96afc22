"""Standalone evaluation CLI.

Counterpart of ``train_models.py --mode testing`` (train_models.py:68-71) and
of the metric contract the reference's TF eval script defines — full-split
accuracy AND top-3 accuracy (evaluate_tf.py:63-76). Results land in
``results/<model>.txt`` (reference format, solver.py:179-182) plus a JSON
sidecar with the exact-denominator and top-3 numbers.
"""

from vqa_attention_networks_tpu.cli.train import main as _train_main


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    argv = list(argv) if argv is not None else None
    if argv is None:
        import sys

        argv = sys.argv[1:]
    if "--mode" not in " ".join(argv):
        argv = argv + ["--mode", "testing"]
    _train_main(argv)


if __name__ == "__main__":
    main()
