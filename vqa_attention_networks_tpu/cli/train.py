"""Training / testing CLI (counterpart of train_models.py:15-71).

Same flag surface, constructing one frozen Config instead of mutating a
global easydict (cfg.py policy — see config.py)."""

import argparse
import sys


from vqa_attention_networks_tpu.config import Config
from vqa_attention_networks_tpu.data.feature_store import open_feature_store
from vqa_attention_networks_tpu.data.glove import load_glove_table
from vqa_attention_networks_tpu.data.prepare import load_qa_data, qa_artifact_path
from vqa_attention_networks_tpu.parallel.distributed import initialize_distributed
from vqa_attention_networks_tpu.train.solver import Solver


def build_solver(args) -> Solver:
    base = qa_artifact_path(args.data_dir, args.version, args.num_answer,
                            args.answer_type)
    qa_data = load_qa_data(base)
    # opens <ft>_all, or combines the per-split stores the extraction CLI
    # writes (<ft>_train + <ft>_val)
    store = open_feature_store(args.data_dir, args.feature_type)

    cfg = Config(
        model_name=args.model_name,
        q_vocab_size=qa_data.q_vocab_size,
        a_vocab_size=qa_data.a_vocab_size,
        max_question_length=qa_data.max_question_length,
        # the opened store dictates the image-feature width (a VGG19 store
        # is 512-channel; defaulting to 2048 would size every projection
        # wrong and die with a raw shape error at the first batch)
        img_feature_channel=store.channels,
        feature_type=args.feature_type,
        glove=bool(args.glove),
        image_first=bool(args.image_first),
        mode=args.mode,
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        num_epoch=args.num_epoch,
        compute_dtype=args.compute_dtype,
        fast_path=args.fast_path,
        dropout_site=args.dropout_site,
        device_feature_bank=bool(args.device_feature_bank),
        device_feature_bank_budget=int(
            args.device_feature_bank_budget * (1 << 30)
        ),
        device_feature_bank_shard=bool(args.device_feature_bank_shard),
        early_stopping=bool(args.early_stopping),
        patience=args.patience,
        early_stop_metric=args.early_stop_metric,
        checkpoint_every_steps=args.checkpoint_every_steps,
        model_parallel=args.model_parallel,
        rng_impl=args.rng_impl,
        remat=bool(args.remat),
        grad_accum_steps=args.grad_accum_steps,
        prefetch_workers=args.prefetch_workers,
        seed=args.seed,
    ).validate()
    print(f"q_vocab_size {cfg.q_vocab_size}")
    print(f"a_vocab_size {cfg.a_vocab_size}")

    glove_table = None
    if cfg.glove:
        glove_table = load_glove_table(f"{args.data_dir}/glove_table.npy")
        if glove_table is None:
            print("WARNING: data/glove_table.npy not found; GloVe rows are "
                  "zero. Build it offline with data/glove.py.")

    return Solver(cfg, qa_data, store, glove_table=glove_table)


def main(argv=None) -> None:
    from vqa_attention_networks_tpu.utils.runtime import setup as _rt_setup
    _rt_setup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, default="mhb",
                        help="mfb|mfb-multilayer|mhb|mhb_coAtt|hieCoAtten|"
                             "visLstm|iBOWIMG|attentionNet (default=mhb)")
    parser.add_argument("--version", type=int, default=2)
    parser.add_argument("--image_first", type=int, default=0)
    parser.add_argument("--num_answer", type=int, default=1000)
    parser.add_argument("--answer_type", type=str, default="all",
                        help="all|other|yes/no|number — must match the "
                             "artifact prepare_data wrote")
    parser.add_argument("--mode", type=str, default="training",
                        help="training | testing")
    parser.add_argument("--glove", type=int, default=0)
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--feature_type", type=str, default="resnet152")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_epoch", type=int, default=18)
    parser.add_argument("--compute_dtype", type=str, default="float32")
    parser.add_argument("--device_feature_bank", type=int, default=0,
                        help="keep the WHOLE feature store in device HBM "
                             "and gather in-graph (zero feature bytes per "
                             "step on the host->device link); bit-identical "
                             "to the host feed. Needs the store to fit "
                             "next to params/activations — the Solver "
                             "enforces Config.device_feature_bank_budget")
    parser.add_argument("--device_feature_bank_budget", type=float,
                        default=8.0, metavar="GIB",
                        help="HBM byte budget for --device_feature_bank, "
                             "in GiB PER DEVICE "
                             "(Config.device_feature_bank_budget); raise "
                             "it when the chip has headroom, lower it to "
                             "leave room for params/activations")
    parser.add_argument("--device_feature_bank_shard", type=int, default=0,
                        help="shard the bank's rows over the 'data' mesh "
                             "axis instead of replicating (per-device HBM "
                             "cost drops to store/n_data; the in-graph "
                             "gather becomes a ppermute ring over ICI). "
                             "Bit-identical to the replicated bank and "
                             "the host feed")
    parser.add_argument("--dropout_site", type=str, default="prepool",
                        help="grid-fusion dropout site: 'prepool' keeps "
                             "the reference recipe (mask on the pre-pool "
                             "product); 'pooled' is the weight-contracted "
                             "fast-train mode (Config.dropout_site)")
    parser.add_argument("--fast_path", type=str, default="auto",
                        help="auto|pallas|composed — bf16 eval wq-kernel "
                             "dispatch policy (config.py fast_path)")
    parser.add_argument("--early_stopping", type=int, default=0)
    parser.add_argument("--patience", type=int, default=10,
                        help="early-stopping patience in epochs "
                             "(reference: solver.py:42-45)")
    parser.add_argument("--early_stop_metric", type=str, default="loss",
                        help="loss (solver.py:160-172) | acc "
                             "(legacy trainer, train_hfd.py:154-166)")
    parser.add_argument("--checkpoint_every_steps", type=int, default=2000,
                        help="mid-training checkpoint cadence; 0 disables "
                             "(final save always writes one)")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0,
                        help="controls init, shuffle order and dropout; two "
                             "runs with the same seed are bit-identical")
    parser.add_argument("--grad_accum_steps", type=int, default=1,
                        help="split each optimizer step into N sequential "
                             "microbatches (peak memory of one microbatch; "
                             "must divide batch_size)")
    parser.add_argument("--remat", type=int, default=0,
                        help="1 = rematerialise the forward during backward "
                             "(jax.checkpoint): identical gradients, lower "
                             "peak HBM, ~1.3x step FLOPs")
    parser.add_argument("--prefetch_workers", type=int, default=4,
                        help="host batch-assembly threads (the counterpart "
                             "of the reference's 4 DataLoader workers, "
                             "cfg.py:6); 1 = single-producer prefetch")
    parser.add_argument("--rng_impl", type=str, default="threefry2x32",
                        help="threefry2x32 (reproducible) | rbg (~30%% faster "
                             "train steps on TPU)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint")
    parser.add_argument("--torch_checkpoint", type=str, default=None,
                        help="a reference models/<name>.pth state_dict "
                             "(solver.py:190) to evaluate with --mode "
                             "testing; imported into this framework's "
                             "param tree (utils/torch_import.py) instead "
                             "of restoring an orbax checkpoint")
    args = parser.parse_args(argv)

    # multi-host entry: no-op single-process, initialises the cluster when
    # JAX_COORDINATOR_ADDRESS / TPU pod discovery env is present. Must run
    # before anything touches a device (parallel/distributed.py).
    initialize_distributed()

    solver = build_solver(args)

    if args.torch_checkpoint:
        if args.mode != "testing":
            sys.exit("--torch_checkpoint is evaluation-only: pass --mode "
                     "testing (to fine-tune reference weights, convert them "
                     "first with tools/import_torch.py)")
        from vqa_attention_networks_tpu.utils.torch_import import (
            import_state_dict, load_pth,
        )
        solver.params = import_state_dict(
            args.model_name, load_pth(args.torch_checkpoint), solver.params
        )
        print(f"imported reference checkpoint {args.torch_checkpoint}")
    elif args.resume or args.mode == "testing":
        try:
            solver.restore()
            print(f"restored checkpoint at step {solver.step}")
        except FileNotFoundError:
            if args.mode == "testing":
                print("no checkpoint found for testing mode")
                sys.exit(-1)

    if args.mode == "testing" and solver.best_params is not None:
        # evaluate the early-stopping best snapshot, matching the reference
        # whose final .pth holds the best weights (solver.py:165,184-190)
        solver.params = solver.best_params

    if args.mode == "training":
        solver.train()
        solver.save()
        print("Training done")
    else:
        print(f"Start to evaluate model: {args.model_name}")
        solver.val(full=True)
        print("Testing done")


if __name__ == "__main__":
    main()
