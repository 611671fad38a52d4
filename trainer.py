"""Training entry point.

Mirrors the reference trainer script's workflow and shipped defaults
(/root/reference/src/trainer.py:12-73): load train/validate(/benchmark)
patch-index CSVs, build three input pipelines (train + val shuffled,
benchmark unshuffled for stable quicksaves), construct the trainer,
optionally restore, train.

The reference is configured by editing constants; those constants are kept
below with identical names and defaults, and every one can also be
overridden from the command line (see --help).
"""

import argparse

import jax.numpy as jnp

from flownet4d_tpu.data import PatchLoader, load_indexes
from flownet4d_tpu.training import TrainerController


def load_config_file(path: str, parser: argparse.ArgumentParser) -> dict:
    """JSON/YAML -> argparse defaults dict; unknown keys are an error.

    The reference configures by editing constants (trainer.py:13-39); this
    is the file-based equivalent. CLI flags override file values.
    """
    with open(path) as f:
        text = f.read()
    try:
        import json

        cfg = json.loads(text)
    except ValueError:
        try:
            import yaml  # type: ignore

            cfg = yaml.safe_load(text)
        except ImportError as e:
            raise SystemExit(
                f"{path} is not JSON and PyYAML is not installed"
            ) from e
    if not isinstance(cfg, dict):
        raise SystemExit(f"{path} must contain a mapping of flag names")
    valid = {a.dest for a in parser._actions}
    unknown = set(cfg) - valid
    if unknown:
        raise SystemExit(f"unknown config keys in {path}: {sorted(unknown)}")
    return cfg


def build_lr_schedule(kind: str, peak: float, final: float,
                      warmup_steps: int, total_steps: int):
    """Optional optax schedule for the trainer.

    Linear 0 -> peak warmup composes with EITHER schedule kind (ADVICE r4:
    --warmup-steps used to be silently ignored without --lr-schedule
    cosine): fresh Adam calibrates v_hat before full-size steps — the
    round-3/4 post-mortem fix for near-init / just-restored ejections
    (docs/training.md). Returns None for plain constant lr (the
    reference's behaviour, TrainerController.py:280)."""
    if kind == "cosine":
        import optax

        if warmup_steps > 0:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=peak,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
                end_value=final,
            )
        return optax.cosine_decay_schedule(
            peak, decay_steps=total_steps, alpha=final / peak,
        )
    if warmup_steps > 0:
        import optax

        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup_steps),
             optax.constant_schedule(peak)],
            boundaries=[warmup_steps],
        )
    return None


def main():
    from flownet4d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # ---- Reference defaults (trainer.py:13-39) ----
    data_dir = "data"
    QUICKSAVE = True
    restore = False
    model_dir = None
    model_file = None

    initial_learning_rate = 2e-4
    epochs = 60
    batch_size = 20
    mask_threshold = 0.6

    network_name = "4DFlowNet"
    patch_size = 16
    res_increase = 2
    low_resblock = 8
    hi_resblock = 4

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=data_dir)
    p.add_argument("--training-file", default=None, help="default: <data-dir>/train.csv")
    p.add_argument("--validate-file", default=None, help="default: <data-dir>/validate.csv")
    p.add_argument("--benchmark-file", default=None, help="default: <data-dir>/benchmark.csv")
    p.add_argument("--no-quicksave", action="store_true")
    p.add_argument("--restore", action="store_true")
    p.add_argument("--model-dir", default=model_dir)
    p.add_argument("--model-file", default=model_file)
    p.add_argument("--initial-learning-rate", type=float, default=initial_learning_rate)
    p.add_argument("--epochs", type=int, default=epochs)
    p.add_argument("--batch-size", type=int, default=batch_size)
    p.add_argument("--mask-threshold", type=float, default=mask_threshold)
    p.add_argument("--network-name", default=network_name)
    p.add_argument("--patch-size", type=int, default=patch_size)
    p.add_argument("--res-increase", type=int, default=res_increase)
    p.add_argument("--low-resblock", type=int, default=low_resblock)
    p.add_argument("--hi-resblock", type=int, default=hi_resblock)
    p.add_argument("--models-dir", default="models", help="where model run dirs are created")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (throughput mode)")
    p.add_argument("--precision", choices=["default", "high", "highest"],
                   default=None,
                   help="MXU precision override (default: highest for f32 "
                        "parity, 1-pass for bf16); 'high' = 3-pass bf16x3, "
                        "~2x faster f32-params training than 'highest'")
    p.add_argument("--n-parallel", type=int, default=4, help="loader worker threads")
    p.add_argument("--no-packed-transfer", action="store_true",
                   help="disable the f16/u8 wire format (bit-exact f32 inputs)")
    p.add_argument("--remat", dest="remat", action="store_true", default=None,
                   help="force residual-block rematerialization on")
    p.add_argument("--no-remat", dest="remat", action="store_false",
                   help="force rematerialization off (the default: the paper "
                        "config fits HBM and runs faster without it)")
    p.add_argument("--remat-scope", choices=["all", "hi", "low"], default="all",
                   help="which residual stacks to rematerialize when remat is "
                        "on ('hi' = the HBM-heavy hi-res stack only)")
    p.add_argument("--no-fused-boundary", action="store_true",
                   help="use explicit symmetric pads instead of the "
                        "boundary-corrected SAME convs")
    p.add_argument("--div-weight", type=float, default=0.0,
                   help="divergence loss weight (dormant in the reference)")
    p.add_argument("--profile-dir", default=None, help="jax.profiler trace directory")
    p.add_argument("--resume", metavar="RUN_DIR", default=None,
                   help="elastic resume: continue an interrupted run from "
                        "RUN_DIR/<network-name>-latest.ckpt (restores "
                        "optimizer state + epoch; SIGTERM during training "
                        "checkpoints for this)")
    p.add_argument("--lr-schedule", choices=["constant", "cosine"],
                   default="constant",
                   help="cosine: decay from --initial-learning-rate to "
                        "--lr-final over the whole run (the reference keeps "
                        "a constant lr; its adjust_learning_rate hook is "
                        "commented out at TrainerController.py:280)")
    p.add_argument("--lr-final", type=float, default=1e-6,
                   help="final learning rate for --lr-schedule cosine")
    p.add_argument("--adam-b2", type=float, default=0.999,
                   help="Adam beta2 (reference value 0.999)")
    p.add_argument("--adam-eps", type=float, default=1e-7,
                   help="Adam epsilon (reference value 1e-7). Raise to "
                        "~1e-4 on small/demo cohorts: near convergence the "
                        "gradient and v_hat shrink until Adam's effective "
                        "step lr/(sqrt(v_hat)+eps) explodes "
                        "(docs/training.md)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="parameter EMA decay (e.g. 0.999); val/best/.h5 "
                        "export then use the averaged weights "
                        "(docs/training.md; extension over the reference)")
    p.add_argument("--clip-norm", type=float, default=None,
                   help="global-norm gradient clipping (extension over the "
                        "reference, which never clips; recommended ~1.0 on "
                        "small/augmented cohorts where Adam hits "
                        "edge-of-stability oscillation — docs/training.md)")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="linear lr warmup steps ahead of the main schedule "
                        "(works with both constant and cosine); calibrates "
                        "fresh Adam state before full-size steps — the "
                        "round-4 ejections all happened near init/restore "
                        "where curvature is largest (docs/training.md)")
    p.add_argument("--restart-on-spike", type=float, default=None,
                   metavar="FACTOR",
                   help="if an epoch's mean train loss exceeds FACTOR x the "
                        "best epoch mean (or goes non-finite), reload the "
                        "best checkpoint and continue at half the learning "
                        "rate (edge-of-stability ejection recovery, "
                        "docs/training.md; suggested FACTOR ~10)")
    p.add_argument("--max-restarts", type=int, default=3,
                   help="cap on --restart-on-spike restarts per run")
    p.add_argument("--residual-skip", action="store_true",
                   help="heads predict a correction on top of the trilinear "
                        "upsample of the input, with zero-init final "
                        "kernels — the untrained net equals the "
                        "interpolation baseline (extension over the "
                        "reference; stored in the exported .h5 attrs)")
    p.add_argument("--metric-fetch-every", type=int, default=8,
                   help="train-loop metric readback cadence in batches "
                        "(metrics accumulate on device between fetches; "
                        "1 = per-batch reference behaviour)")
    p.add_argument("--rel-loss-weight", type=float, default=0.0,
                   help="weight of the smooth relative-speed-error loss "
                        "term (ops/losses.py::relative_error_loss). The "
                        "reference reports this metric (loss_utils.py:64-"
                        "103) but trains on masked MSE only; >0 optimizes "
                        "the published metric directly (extension)")
    p.add_argument("--rel-loss-eps", type=float, default=0.05,
                   help="denominator floor of the rel loss term, in "
                        "venc-normalized speed units")
    p.add_argument("--latest-every", type=int, default=10,
                   help="epoch cadence for the -latest.ckpt autosave")
    p.add_argument("--config", default=None, metavar="FILE",
                   help="JSON or YAML file of flag defaults (keys use "
                        "underscores, e.g. patch_size); explicit CLI flags "
                        "still win")
    # Pre-scan --config with a help-less parser so the file is applied
    # before --help renders (and its defaults show up in the help text).
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    cfg_probe, _ = pre.parse_known_args()
    if cfg_probe.config:
        p.set_defaults(**load_config_file(cfg_probe.config, p))
    args = p.parse_args()

    training_file = args.training_file or f"{args.data_dir}/train.csv"
    validate_file = args.validate_file or f"{args.data_dir}/validate.csv"
    benchmark_file = args.benchmark_file or f"{args.data_dir}/benchmark.csv"
    quicksave = QUICKSAVE and not args.no_quicksave

    trainset = load_indexes(training_file)
    valset = load_indexes(validate_file)

    # Input pipelines: train/val shuffled, benchmark unshuffled (ref :47-61)
    z = PatchLoader(args.data_dir, args.patch_size, args.res_increase,
                    args.batch_size, args.mask_threshold)
    trainset = z.initialize_dataset(trainset, shuffle=True, n_parallel=args.n_parallel)

    valdh = PatchLoader(args.data_dir, args.patch_size, args.res_increase,
                        args.batch_size, args.mask_threshold)
    valset = valdh.initialize_dataset(valset, shuffle=True, n_parallel=args.n_parallel)

    testset = None
    if quicksave and benchmark_file is not None:
        ph = PatchLoader(args.data_dir, args.patch_size, args.res_increase,
                         args.batch_size, args.mask_threshold)
        testset = ph.initialize_dataset(load_indexes(benchmark_file), shuffle=False)

    lr_schedule = build_lr_schedule(
        args.lr_schedule, args.initial_learning_rate, args.lr_final,
        args.warmup_steps, max(1, args.epochs * max(1, len(trainset))))

    print(f"4DFlowNet Patch {args.patch_size}, lr {args.initial_learning_rate}, "
          f"batch {args.batch_size}")
    network = TrainerController(
        args.patch_size,
        args.res_increase,
        args.initial_learning_rate,
        quicksave,
        args.network_name,
        args.low_resblock,
        args.hi_resblock,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        models_dir=args.models_dir,
        packed_transfer=not args.no_packed_transfer,
        remat=args.remat,
        remat_scope=args.remat_scope,
        fused_boundary=not args.no_fused_boundary,
        precision=args.precision,
        div_weight=args.div_weight,
        profile_dir=args.profile_dir,
        latest_every=args.latest_every,
        lr_schedule=lr_schedule,
        clip_norm=args.clip_norm,
        adam_eps=args.adam_eps,
        ema_decay=args.ema_decay,
        rel_loss_weight=args.rel_loss_weight,
        rel_loss_eps=args.rel_loss_eps,
        residual_skip=args.residual_skip,
        metric_fetch_every=args.metric_fetch_every,
        spike_factor=args.restart_on_spike,
        max_restarts=args.max_restarts,
    )
    if args.resume:
        network.resume_from(args.resume)
    else:
        network.init_model_dir()

    if args.restore:
        print(f"Restoring model {args.model_file}...")
        network.restore_model(args.model_dir, args.model_file)

    network.train_network(trainset, valset, n_epoch=args.epochs, testset=testset)


if __name__ == "__main__":
    main()
