"""CLI entry point (reference layer L7, SURVEY.md §1.1: `main.py --mode
train|test/infer` dispatch — here as subcommands).

    python -m gan_sass_tf_tpu.cli train    --config 2src_toy_cpu --workdir runs/toy
    python -m gan_sass_tf_tpu.cli separate --config 2src_toy_cpu --workdir runs/toy \
        --input mix.wav --output-dir out/ [--streaming]
    python -m gan_sass_tf_tpu.cli eval     --config 2src_toy_cpu --workdir runs/toy
    python -m gan_sass_tf_tpu.cli configs
"""

from __future__ import annotations

import argparse
import sys

from gan_sass_tf_tpu import config as config_lib


def _add_common(p):
    p.add_argument("--config", required=True, help="preset name")
    p.add_argument("--workdir", default=None, help="run directory (ckpts/metrics)")
    p.add_argument("--set", action="append", default=[], metavar="SEC.KEY=VAL",
                   help="config override, e.g. train.batch_size=8")


def _apply_overrides(cfg, overrides):
    import dataclasses

    # Group per section and replace each section ONCE: dataclass
    # __post_init__ validation then sees every override together, so
    # mutually-dependent pairs work in either order (e.g.
    # `--set train.d_lr_schedule=cosine --set train.lr_decay_steps=10000`
    # would fail applied one at a time — the intermediate config has a
    # cosine schedule with a zero horizon).
    per_section: dict = {}
    for item in overrides:
        path, _, raw = item.partition("=")
        sec, _, key = path.partition(".")
        section = getattr(cfg, sec)
        old = getattr(section, key)  # raises AttributeError on typos
        typ = type(old)
        if typ is bool:
            val = raw.lower() in ("1", "true", "yes")
        elif typ is tuple:
            def _elem(x):
                try:
                    return int(x)
                except ValueError:
                    return float(x)
            val = tuple(_elem(x) for x in raw.split(","))
        elif old is None:
            val = raw
        else:
            val = typ(raw)
        per_section.setdefault(sec, {})[key] = val
    return cfg.replace(**{
        sec: dataclasses.replace(getattr(cfg, sec), **kw)
        for sec, kw in per_section.items()
    })


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gan_sass_tf_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="run the alternating G/D training loop")
    _add_common(p_train)
    p_train.add_argument("--steps", type=int, default=None)
    p_train.add_argument("--profile-steps", default=None, metavar="A:B",
                         help="capture a jax.profiler trace for steps [A, B)")
    p_train.add_argument("--no-resume", action="store_true")
    p_train.add_argument("--debug-nans", action="store_true",
                         help="trip on the first non-finite value in the step")
    p_train.add_argument("--debug-leaks", action="store_true",
                         help="trip on jit tracer leaks (jax.checking_leaks)")
    p_train.add_argument("--tensorboard", action="store_true",
                         help="mirror metrics to <workdir>/tb via tf.summary")

    p_sep = sub.add_parser("separate", help="separate a mixture wav into sources")
    _add_common(p_sep)
    p_sep.add_argument("--input", required=True, help="mixture wav path")
    p_sep.add_argument("--output-dir", required=True)
    p_sep.add_argument("--best", action="store_true",
                       help="use the best-held-out-eval checkpoint "
                            "(workdir/best) instead of the latest")
    p_sep.add_argument("--streaming", action="store_true",
                       help="chunked overlap-add streaming mode")
    p_sep.add_argument("--streaming-mode", choices=["batch", "scan"],
                       default="batch",
                       help="batch: chunks batched over the mesh (throughput); "
                            "scan: sequential scan-carry (low latency)")

    p_eval = sub.add_parser("eval", help="SI-SDR evaluation on held-out mixtures")
    _add_common(p_eval)
    p_eval.add_argument("--batches", type=int, default=8)
    p_eval.add_argument("--best", action="store_true",
                        help="use the best-held-out-eval checkpoint "
                             "(workdir/best) instead of the latest")

    sub.add_parser("configs", help="list available config presets")

    args = parser.parse_args(argv)

    if args.cmd == "configs":
        for name in config_lib.list_configs():
            print(name)
        return 0

    cfg = _apply_overrides(config_lib.get_config(args.config), args.set)

    # For inference/eval against an existing run, the config stored in the
    # workdir is authoritative (the user shouldn't have to replay every
    # --set override used at train time).
    if args.cmd in ("separate", "eval") and args.workdir:
        import os

        cfg_path = os.path.join(args.workdir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                stored = config_lib.Config.from_json(f.read())
            if stored.name != cfg.name:
                print(f"error: workdir was trained with config "
                      f"{stored.name!r}, not {cfg.name!r}")
                return 1
            if args.set:
                print("note: ignoring --set overrides; using the workdir's "
                      "stored config")
            cfg = stored

    from gan_sass_tf_tpu.train import Experiment

    if args.cmd == "train":
        from gan_sass_tf_tpu.utils.profiler import parse_profile_steps

        exp = Experiment(cfg, workdir=args.workdir, resume=not args.no_resume,
                         debug_nans=args.debug_nans,
                         debug_leaks=args.debug_leaks,
                         tensorboard=args.tensorboard)
        prof = parse_profile_steps(args.profile_steps) if args.profile_steps else None

        def log(step, m):
            print(
                f"step {step}: g={m['g_loss']:.4f} d={m['d_loss']:.4f} "
                f"recon={m['g_recon']:.4f} "
                f"thr={m['mixture_sec_per_sec']:.1f} mix-s/s",
                flush=True,
            )

        exp.train(num_steps=args.steps, profile_steps=prof, log_fn=log)
        exp.close()
        return 0

    exp = Experiment(cfg, workdir=args.workdir, resume=True)
    if getattr(args, "best", False):
        step = exp.restore_best()
        print(f"using best checkpoint (step {step})")
    if args.cmd == "eval":
        out = exp.evaluate(num_batches=args.batches)
        for k, v in out.items():
            print(f"{k}: {v:.3f}")
        exp.close()
        return 0

    if args.cmd == "separate":
        if args.streaming:
            from gan_sass_tf_tpu.infer import (
                separate_streaming,
                separate_streaming_scan,
            )
            from gan_sass_tf_tpu.utils.wav_io import read_wav, write_wav
            import os

            sr, wav = read_wav(args.input)
            if sr != cfg.dsp.sample_rate:
                print(f"error: wav sr {sr} != config sr {cfg.dsp.sample_rate}")
                return 1
            if args.streaming_mode == "scan":
                srcs = separate_streaming_scan(exp.eval_g_params, cfg, wav)
            else:
                srcs = separate_streaming(
                    exp.eval_g_params, cfg, wav, mesh=exp.mesh
                )
            os.makedirs(args.output_dir, exist_ok=True)
            stem = os.path.splitext(os.path.basename(args.input))[0]
            for i, w in enumerate(srcs):
                path = os.path.join(args.output_dir, f"{stem}_src{i}.wav")
                write_wav(path, sr, w)
                print(path)
        else:
            from gan_sass_tf_tpu.infer import separate_file

            paths = separate_file(
                exp.eval_g_params, cfg, args.input, args.output_dir,
                separate_fn=None,
            )
            for p in paths:
                print(p)
        exp.close()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
