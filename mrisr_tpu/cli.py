"""Command-line interface.

The reference has no CLI (``import argparse`` unused — SURVEY.md §5 config
row); this provides the missing operational surface:

    python -m mrisr_tpu.cli preprocess-slices  --data-dir ... --out ...
    python -m mrisr_tpu.cli export-png         --source ... --dest ...
    python -m mrisr_tpu.cli build-index        --root ... --out index.json
    python -m mrisr_tpu.cli train-cnn          [--config c.yaml] ...
    python -m mrisr_tpu.cli train-resdiff      [--config c.yaml] ...
    python -m mrisr_tpu.cli train-mnist        [--mode regression|ddpm]
    python -m mrisr_tpu.cli sr-volume          --checkpoint ... --input vol.nii.gz
    python -m mrisr_tpu.cli evaluate           --gen DIR --gt DIR
"""
from __future__ import annotations

import argparse
import json
import sys


def _add_common(p):
    p.add_argument("--config", default=None, help="YAML/JSON config file")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--seed", type=int, default=42)


def _add_train_common(p):
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--val-every", type=int, default=0, help="validate every N steps (0=off)")
    p.add_argument("--val-steps", type=int, default=20, help="sampler steps at validation")
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument(
        "--precision", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype (params stay fp32)",
    )
    p.add_argument("--cache", default=None, help="native slice-cache file to train from")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the forward in backward (larger batches)")


# typed-config field -> CLI argument name (precedence: CLI flag > config
# file > parser default; see _apply_config)
_CONFIG_TO_ARG = {
    ("data", "resolution"): "resolution",
    ("data", "batch_size"): "batch",
    ("data", "data_dir"): "data_dir",
    ("train", "max_steps"): "steps",
    ("train", "seed"): "seed",
    ("train", "val_every"): "val_every",
    ("train", "mixed_precision"): "precision",
    ("train", "gradient_accumulation"): "grad_accum",
    ("train", "output_dir"): "out",
    ("train", "proportion_empty_prompts"): "proportion_empty_prompts",
    ("optim", "lr"): "lr",
    ("optim", "warmup_steps"): "warmup",
}


def _apply_config(args, subparser):
    """Fill args from --config for every flag the user left at its default."""
    if not getattr(args, "config", None):
        return args
    from mrisr_tpu.config import load_config

    cfg = load_config(args.config)
    defaults = {a.dest: a.default for a in subparser._actions}
    for (section, field), dest in _CONFIG_TO_ARG.items():
        if not hasattr(args, dest):
            continue
        if getattr(args, dest) != defaults.get(dest):
            continue  # explicit CLI flag wins
        sec = getattr(cfg, section, None)
        if sec is None or not hasattr(sec, field):
            continue
        val = getattr(sec, field)
        if val != getattr(type(sec)(), field):  # only values the file set
            setattr(args, dest, val)
    return args


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mrisr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    subparsers = {}
    _orig_add = sub.add_parser

    def add_parser(name, **kw):
        p = _orig_add(name, **kw)
        subparsers[name] = p
        return p

    sub.add_parser = add_parser  # keep a name->parser registry for _apply_config

    p = sub.add_parser("preprocess-slices", help="BIDS NIfTI pairs -> per-slice npz")
    _add_common(p)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--axis", type=int, default=2)

    p = sub.add_parser("export-png", help="npz slices -> PNG + metadata.jsonl")
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)

    p = sub.add_parser("build-index", help="DICOM tree -> patient index JSON")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("train-mnist", help="MNIST 14->28 toy SR")
    _add_common(p)
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--mode", choices=["regression", "ddpm"], default="ddpm")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--out", default="./outputs/mnist")

    p = sub.add_parser("train-cnn", help="Stage-1 SimpleCNN training")
    _add_common(p)
    _add_train_common(p)
    p.add_argument("--index", required=False, help="patient index JSON")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", default="./outputs/cnn")

    p = sub.add_parser("train-resdiff", help="Stage-2 ResDiff diffusion training")
    _add_common(p)
    _add_train_common(p)
    p.add_argument("--index", required=False)
    p.add_argument("--cnn-checkpoint", default=None)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--out", default="./outputs/resdiff")

    p = sub.add_parser("build-cache", help="materialise a dataset into the native slice cache")
    _add_common(p)
    p.add_argument("--index", required=False, help="patient index JSON (phantom fallback)")
    p.add_argument("--out", required=True, help="cache file path")
    p.add_argument("--resolution", type=int, default=256)

    p = sub.add_parser("stats", help="BIDS dataset analytics (subject/session overlap)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", default=None, help="optional JSON report path")

    p = sub.add_parser("report", help="visual dataset report (LR|HR montages + stats)")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--axis", type=int, default=2)
    p.add_argument("--max-subjects", type=int, default=None)

    p = sub.add_parser("sr-volume", help="NIfTI volume -> SR NIfTI volume")
    _add_common(p)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chains", type=int, default=None,
                   help="chains per device dispatch (amortizes per-dispatch "
                        "overhead; default env MRISR_VOLUME_CHAINS or 1)")

    p = sub.add_parser("evaluate", help="folder-vs-folder MRI metrics")
    p.add_argument("--gen", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument(
        "--state", default=None,
        help="progress file enabling resumable evaluation (reference cells 32/50)",
    )

    p = sub.add_parser(
        "train-latent",
        help="PEFT training on the SD1.5 latent stack (ControlNet / LoRA / T2I-Adapter)",
    )
    _add_common(p)
    _add_train_common(p)
    p.add_argument("--mode", choices=["controlnet", "lora", "adapter"], default="controlnet")
    p.add_argument("--index", required=False)
    p.add_argument("--weights-dir", default=None,
                   help="dir of converted .npz params (unet.npz, vae.npz, clip.npz)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--lora-rank", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=int, default=500)
    p.add_argument("--proportion-empty-prompts", type=float, default=0.1)
    p.add_argument("--tiny", action="store_true", help="tiny tower config (hermetic/CPU)")
    p.add_argument("--out", default="./outputs/latent")

    p = sub.add_parser(
        "convert-weights",
        help="torch/diffusers checkpoint (.safetensors/.bin) -> flax params .npz",
    )
    p.add_argument("--model", required=True,
                   choices=["vae", "unet", "controlnet", "clip", "clip-proj"])
    p.add_argument("--input", required=True, help=".safetensors or torch .bin/.pt")
    p.add_argument("--output", required=True, help="output .npz params file")
    p.add_argument("--num-layers", type=int, default=None, help="CLIP tower depth")

    p = sub.add_parser("parity", help="fidelity-parity harness (hermetic configs)")
    _add_common(p)
    p.add_argument("--out", default="PARITY_RUN.json")
    p.add_argument("--mnist-steps", type=int, default=300)
    p.add_argument("--phantom-steps", type=int, default=400)
    p.add_argument("--resdiff-steps", type=int, default=300)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--index", default=None, help="FastMRI index for the real-data anchor")
    p.add_argument("--n-train", type=int, default=64, help="phantom training-set size")
    p.add_argument("--lr-schedule", default="constant", choices=["constant", "cosine"])
    p.add_argument("--batch", type=int, default=8, help="phantom training batch size")
    p.add_argument("--plain-phantoms", action="store_true",
                   help="legacy smooth-blob phantoms (no texture/lines)")
    p.add_argument("--degrade-scale", type=float, default=4.0,
                   help="degradation scale (blur sigma = 0.5*scale + bicubic down/up)")
    p.add_argument("--fast", type=int, default=0,
                   help="sample with the fast CA profile (K/V pool factor)")
    p.add_argument("--skip-mnist", action="store_true",
                   help="skip the MNIST leg (phantom-only runs)")
    p.add_argument("--texture-mode", default="recoverable",
                   choices=["recoverable", "legacy"],
                   help="textured-phantom information structure (see "
                        "eval/parity.py::_phantom_batches)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="run a 50-step sampling eval every N resdiff steps")
    p.add_argument("--ckpt", default=None,
                   help="save EMA+train params here at every eval (crash "
                        "insurance for multi-hour resdiff runs)")
    p.add_argument("--resume-ckpt", default=None,
                   help="resume resdiff training from a --ckpt file "
                        "(params + EMA + step)")
    p.add_argument("--inner-channel", type=int, default=16,
                   help="resdiff UNet width for the phantom leg")
    p.add_argument("--ema-decay", type=float, default=0.99,
                   help="EMA decay for the phantom resdiff leg "
                        "(use 0.999+ for runs >20k steps)")
    p.add_argument("--n-test", type=int, default=16,
                   help="held-out phantom evaluation set size (use a "
                        "multiple of --batch; >=64 for decision-grade "
                        "profile-fidelity CIs)")
    p.add_argument("--sample-seeds", default="2",
                   help="comma-separated sampler seeds; each profile is "
                        "sampled n_test x len(seeds) times with paired noise")
    p.add_argument("--chunk-steps", type=int, default=0,
                   help="scanned-training steps per TPU dispatch (0 = "
                        "follow --eval-every; keep each dispatch under "
                        "~60-90s of chip time through the relay)")
    p.add_argument("--sample-steps", default="10,50,250,1000",
                   help="comma-separated sampling-chain lengths for the "
                        "final sweep (at 256^2 drop 1000: an 8-chain "
                        "1000-step dispatch exceeds the relay limit)")

    p = sub.add_parser(
        "parity-latent",
        help="latent-path (ControlNet/LoRA) trained-model fidelity leg "
        "(phantom scale; reference src/adapters/res_srdiff.py:36-105)",
    )
    _add_common(p)
    p.add_argument("--out", default="PARITY_LATENT.json")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-test", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--vae-steps", type=int, default=4000)
    p.add_argument("--base-steps", type=int, default=6000)
    p.add_argument("--cn-steps", type=int, default=3000)
    p.add_argument("--lora-steps", type=int, default=3000)
    p.add_argument("--inference-steps", type=int, default=20)
    p.add_argument("--sample-seeds", default="2,3")
    p.add_argument("--degrade-scale", type=float, default=4.0)
    p.add_argument("--texture-mode", default="recoverable",
                   choices=["recoverable", "legacy"])
    p.add_argument("--lora-rank", type=int, default=4)
    p.add_argument("--chunk-steps", type=int, default=0,
                   help="scanned-training steps per dispatch (0 = per-step "
                        "loop); on TPU through the relay keep each chunk "
                        "under ~60-90s of chip time")
    p.add_argument("--vae-width", type=int, default=16,
                   help="phantom-scale VAE base width (blocks w,2w,4w)")
    p.add_argument("--unet-width", type=int, default=32,
                   help="phantom-scale SDUNet/ControlNet base width (w,2w,2w,2w)")
    p.add_argument("--prediction-type", default="epsilon",
                   choices=["epsilon", "sample"],
                   help="diffusers scheduler convention: 'epsilon' (the "
                        "reference SD1.5 setting) or 'sample' (model "
                        "predicts x0 directly - the stable choice for "
                        "from-scratch phantom-scale training; see "
                        "diffusion/res_shift.py)")
    p.add_argument("--adapter-steps", type=int, default=0,
                   help="T2I-Adapter leg training steps (0 = skip the leg)")
    p.add_argument("--cn-lora-steps", type=int, default=0,
                   help="combined ControlNet+LoRA leg training steps (the "
                        "reference notebook's configuration; 0 = skip)")
    p.add_argument("--lora-ranks", default="",
                   help="comma-separated extra LoRA ranks for the rank "
                        "sweep (each trained --lora-steps)")
    p.add_argument("--extra-sample-steps", default="",
                   help="comma-separated extra inference chain lengths "
                        "(e.g. 50) sampled for the PEFT rows")
    p.add_argument("--cache-latents", action="store_true",
                   help="precompute VAE posterior moments once and sample "
                        "latents in-step (required at 256^2 through the "
                        "relay: per-step pixel encodes blow the dispatch "
                        "chip-time limit)")
    p.add_argument("--vae-chunk-steps", type=int, default=0,
                   help="separate dispatch chunk for the VAE leg "
                        "(0 = --chunk-steps); keep 256^2 VAE chunks <=100")

    p = sub.add_parser("bench", help="throughput benchmark")
    p.add_argument("--cpu-smoke", action="store_true")

    args = ap.parse_args(argv)
    if getattr(args, "config", None):
        args = _apply_config(args, subparsers[args.cmd])

    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.cmd == "preprocess-slices":
        return _preprocess_slices(args)
    if args.cmd == "export-png":
        from mrisr_tpu.data.export import export_png_dataset

        n = export_png_dataset(args.source, args.dest)
        print(f"exported {n} pairs to {args.dest}")
        return 0
    if args.cmd == "build-index":
        from mrisr_tpu.data.datasets import build_patient_index

        idx = build_patient_index(args.root, args.out)
        print(f"indexed {len(idx)} patients -> {args.out}")
        return 0
    if args.cmd == "train-mnist":
        return _train_mnist(args)
    if args.cmd == "train-cnn":
        return _train_cnn(args)
    if args.cmd == "train-resdiff":
        return _train_resdiff(args)
    if args.cmd == "sr-volume":
        return _sr_volume(args)
    if args.cmd == "build-cache":
        return _build_cache(args)
    if args.cmd == "stats":
        return _stats(args)
    if args.cmd == "report":
        from mrisr_tpu.data.report import visual_report

        stats = visual_report(args.data_dir, args.out, args.axis, args.max_subjects)
        print(f"wrote {len(stats['montages'])} montages + stats.json -> {args.out}")
        return 0
    if args.cmd == "evaluate":
        from mrisr_tpu.eval.metrics import MRIEvaluator

        MRIEvaluator().evaluate_folders(args.gen, args.gt, state_file=args.state)
        return 0
    if args.cmd == "train-latent":
        return _train_latent(args)
    if args.cmd == "convert-weights":
        from mrisr_tpu.data.safetensors_io import load_state_dict_any
        from mrisr_tpu.models.convert import CONVERTERS, save_params_npz

        sd = load_state_dict_any(args.input)
        conv = CONVERTERS[args.model]
        if args.model in ("clip", "clip-proj") and args.num_layers:
            params = conv(sd, num_layers=args.num_layers)
        else:
            params = conv(sd)
        save_params_npz(args.output, params)
        print(f"converted {len(sd)} tensors -> {args.output}")
        return 0
    if args.cmd == "parity":
        from mrisr_tpu.eval.parity import run_parity

        report = run_parity(
            args.out,
            mnist_steps=args.mnist_steps,
            phantom_steps=args.phantom_steps,
            resdiff_steps=args.resdiff_steps,
            res=args.resolution,
            index_json=args.index,
            n_train=args.n_train,
            lr_schedule=args.lr_schedule,
            batch=args.batch,
            textured=not args.plain_phantoms,
            degrade_scale=args.degrade_scale,
            ca_kv_pool=args.fast,
            skip_mnist=args.skip_mnist,
            texture_mode=args.texture_mode,
            eval_every=args.eval_every,
            ckpt_path=args.ckpt,
            resume_ckpt=args.resume_ckpt,
            inner_channel=args.inner_channel,
            ema_decay=args.ema_decay,
            n_test=args.n_test,
            sample_seeds=tuple(int(s) for s in args.sample_seeds.split(",")),
            chunk_steps=args.chunk_steps,
            sample_steps=tuple(int(s) for s in args.sample_steps.split(",")),
        )
        for k in ("mnist_regression", "phantom_cnn", "phantom_resdiff", "fastmri_cnn"):
            if k in report:
                print(k, json.dumps(report[k]["model"]))
        return 0
    if args.cmd == "parity-latent":
        from pathlib import Path

        from mrisr_tpu.eval.parity import run_phantom_latent

        report = run_phantom_latent(
            res=args.resolution,
            n_train=args.n_train,
            n_test=args.n_test,
            batch=args.batch,
            vae_steps=args.vae_steps,
            base_steps=args.base_steps,
            cn_steps=args.cn_steps,
            lora_steps=args.lora_steps,
            num_inference_steps=args.inference_steps,
            sample_seeds=tuple(int(s) for s in args.sample_seeds.split(",")),
            degrade_scale=args.degrade_scale,
            texture_mode=args.texture_mode,
            lora_rank=args.lora_rank,
            chunk_steps=args.chunk_steps,
            prediction_type=args.prediction_type,
            vae_width=args.vae_width,
            unet_width=args.unet_width,
            adapter_steps=args.adapter_steps,
            cn_lora_steps=args.cn_lora_steps,
            lora_ranks=tuple(int(r) for r in args.lora_ranks.split(",") if r),
            extra_sample_steps=tuple(
                int(s) for s in args.extra_sample_steps.split(",") if s
            ),
            cache_latents=args.cache_latents,
            vae_chunk_steps=args.vae_chunk_steps,
        )
        Path(args.out).write_text(json.dumps(report, indent=2))
        for k in ("bicubic_baseline", "vae_recon_ceiling"):
            print(k, json.dumps(report[k]))
        for k, v in report.items():
            if isinstance(v, dict) and "beats_bicubic" in v:
                print(k, json.dumps(v["mean"]),
                      "beats_bicubic:", v["beats_bicubic"])
        return 0
    if args.cmd == "bench":
        from bench import main as bench_main

        sys.argv = ["bench.py"] + (["--cpu-smoke"] if args.cpu_smoke else [])
        bench_main()
        return 0
    return 1


def _preprocess_slices(args):
    import numpy as np

    from mrisr_tpu.data.bids import get_data_dicts
    from mrisr_tpu.data.nifti import read_nifti, to_ras
    from mrisr_tpu.data.slices import scale_intensity_range, volume_to_slices
    from pathlib import Path
    import jax

    pairs = get_data_dicts(args.data_dir)
    print(f"found {len(pairs)} paired scans")
    out = Path(args.out) / "axial"
    out.mkdir(parents=True, exist_ok=True)
    for i, pair in enumerate(pairs):
        vols = {}
        for k in ("lr", "hr"):
            img = to_ras(read_nifti(pair[k]))
            v = scale_intensity_range(img.data, 0, 1000)
            v = np.asarray(
                jax.image.resize(v, (512, 512, 128), "linear")
            )  # MONAI ResizeD(512,512,128) equivalent
            vols[k] = v
        for s, (lr_s, hr_s) in enumerate(volume_to_slices(vols["lr"], vols["hr"], args.axis)):
            np.savez_compressed(out / f"axial_vol_{i:03d}_{s:04d}.npz", lr=lr_s, hr=hr_s)
        print(f"vol_{i:03d}: {vols['lr'].shape[args.axis]} slices")
    return 0


def _train_mnist(args):
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.data.datasets import MNISTSRDataset
    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.diffusion.schedules import mnist_schedule
    from mrisr_tpu.models.mnist_unet import MNISTUNet
    from mrisr_tpu.ops.resize import interpolate_like_torch
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_mnist_ddpm_step, make_mnist_regression_step
    from mrisr_tpu.utils.checkpoint import CheckpointManager
    from mrisr_tpu.utils.logging import MetricLogger

    key = jax.random.PRNGKey(args.seed)
    ds = MNISTSRDataset(args.data_dir)
    loader = Loader(ds, batch_size=args.batch, shuffle=True, seed=args.seed)
    model = MNISTUNet(num_classes=10)
    in_ch = 1 if args.mode == "regression" else 2
    params = model.init(
        key, jnp.zeros((1, 28, 28, in_ch)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    state = create_train_state(model.apply, params, make_optimizer(1e-3))
    sched = mnist_schedule(1000)
    mgr = CheckpointManager(f"{args.out}/ckpt")
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    step_fn = (
        make_mnist_regression_step(model)
        if args.mode == "regression"
        else make_mnist_ddpm_step(model, sched)
    )
    logger = MetricLogger(args.out)
    i = int(state.step)
    while i < args.steps:
        for batch in loader:
            if i >= args.steps:
                break
            lr_up = interpolate_like_torch(
                jnp.asarray(batch["lr"]).transpose(0, 3, 1, 2), (28, 28)
            ).transpose(0, 2, 3, 1)
            b = {"hr": jnp.asarray(batch["hr"]), "lr_up": lr_up, "label": jnp.asarray(batch["label"])}
            state, m = step_fn(state, b, jax.random.fold_in(key, i))
            if i % 50 == 0:
                logger.log(i, m)
            i += 1
    mgr.save(i, state, force=True)
    mgr.close()
    print(f"done; checkpoint at {args.out}/ckpt")
    return 0


def _val_batch_from(ds, n=4):
    import numpy as np

    samples = [ds[i] for i in range(min(n, len(ds)))]
    return {
        "lr": np.stack([np.asarray(s["lr"], np.float32) for s in samples]),
        "hr": np.stack([np.asarray(s["hr"], np.float32) for s in samples]),
    }


def _train_cnn(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.precision import get_policy
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_cnn_train_step
    from mrisr_tpu.train.validation import ValidationHook
    from mrisr_tpu.utils.checkpoint import CheckpointManager
    from mrisr_tpu.utils.logging import MetricLogger

    ds = _resolve_dataset(args)
    loader = Loader(ds, batch_size=args.batch, shuffle=True, seed=args.seed)
    key = jax.random.PRNGKey(args.seed)
    val_key = jax.random.PRNGKey(args.seed + 777)
    cnn = SimpleCNN()
    params = cnn.init(key, jnp.zeros((1, args.resolution, args.resolution, 1)))
    state = create_train_state(
        cnn.apply, params, make_optimizer(1e-4, grad_accum=args.grad_accum)
    )
    mgr = CheckpointManager(f"{args.out}/ckpt")
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    step = make_cnn_train_step(cnn, get_policy(args.precision))
    logger = MetricLogger(args.out)
    hook = None
    if args.val_every > 0:
        sample_fn = jax.jit(cnn.apply)
        hook = ValidationHook(
            lambda p, lr, k: sample_fn(p, jnp.asarray(lr)),
            _val_batch_from(ds),
            f"{args.out}/val",
            every=args.val_every,
            data_in_unit_range=True,
        )
    i = int(state.step)
    while i < args.steps:
        for batch in loader:
            if i >= args.steps:
                break
            b = {
                "lr": jnp.asarray(np.asarray(batch["lr"], np.float32)),
                "hr": jnp.asarray(np.asarray(batch["hr"], np.float32)),
            }
            state, m = step(state, b, jax.random.fold_in(key, i))
            if i % 20 == 0:
                logger.log(i, m)
            i += 1
            if hook is not None:
                vm = hook.maybe_run(i, state.params, jax.random.fold_in(val_key, i))
                if vm:
                    logger.log(i, vm)
                    mgr.save(i, state)
    mgr.save(i, state, force=True)
    mgr.close()
    return 0


def _train_resdiff(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_resdiff_train_step
    from mrisr_tpu.utils.checkpoint import CheckpointManager
    from mrisr_tpu.utils.logging import MetricLogger

    ds = _resolve_dataset(args)
    loader = Loader(ds, batch_size=args.batch, shuffle=True, seed=args.seed)
    key = jax.random.PRNGKey(args.seed)
    val_key = jax.random.PRNGKey(args.seed + 777)
    cnn = SimpleCNN()
    cnn_params = cnn.init(key, jnp.zeros((1, args.resolution, args.resolution, 1)))
    if args.cnn_checkpoint:
        from mrisr_tpu.train.state import create_train_state as cts

        cnn_state = cts(cnn.apply, cnn_params, make_optimizer(1e-4))
        mgr0 = CheckpointManager(args.cnn_checkpoint)
        cnn_params = mgr0.restore(cnn_state).params
        mgr0.close()

    unet = ResDiffUNet(image_size=args.resolution)
    params = unet.init(
        key, jnp.zeros((1, args.resolution, args.resolution, 2)), jnp.array([0.5])
    )
    sched = resdiff_schedule(1000)
    state = create_train_state(
        unet.apply,
        params,
        make_optimizer(1e-5, grad_accum=args.grad_accum),
        ema_decay=0.999,
    )
    mgr = CheckpointManager(f"{args.out}/ckpt")
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    from mrisr_tpu.train.precision import get_policy

    step = make_resdiff_train_step(
        unet, sched, get_policy(args.precision), remat=args.remat
    )
    logger = MetricLogger(args.out)

    cnn_apply = jax.jit(cnn.apply)
    hook = None
    if args.val_every > 0:
        from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
        from mrisr_tpu.train.validation import ValidationHook

        n_steps = args.val_steps
        pipe = ResDiffPipeline(cnn, unet, sched, cnn_params, params)

        def sample_fn(params, lr, k):
            return pipe.super_resolve_with(
                cnn_params, params, jnp.asarray(lr), k, num_steps=n_steps
            )

        hook = ValidationHook(
            sample_fn,
            _val_batch_from(ds),
            f"{args.out}/val",
            every=args.val_every,
            data_in_unit_range=True,
        )

    i = int(state.step)
    while i < args.steps:
        for batch in loader:
            if i >= args.steps:
                break
            lr = jnp.asarray(np.asarray(batch["lr"], np.float32))
            hr = jnp.asarray(np.asarray(batch["hr"], np.float32))
            sr = cnn_apply(cnn_params, lr)
            state, m = step(state, {"sr": sr, "hr": hr}, jax.random.fold_in(key, i))
            if i % 100 == 0:
                logger.log(i, m)
            if i > 0 and i % 2000 == 0:
                mgr.save(i, state)
            i += 1
            if hook is not None:
                val_params = (
                    state.ema_params if state.ema_params is not None else state.params
                )
                vm = hook.maybe_run(i, val_params, jax.random.fold_in(val_key, i))
                if vm:
                    logger.log(i, vm)
    mgr.save(i, state, force=True)
    mgr.close()
    return 0


def _train_latent(args):
    """PEFT training loop (reconstructed reference hyperparameters: lr 1e-5,
    cosine schedule + 500 warmup, grad-norm clip 1.0, CFG dropout 0.1 —
    config cell 11 / src/adapters/utils.py log_configs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.diffusion.schedules import sd15_schedule
    from mrisr_tpu.models.adapter import T2IAdapter
    from mrisr_tpu.models.controlnet import ControlNet
    from mrisr_tpu.models.lora import init_lora_params
    from mrisr_tpu.models.sd_unet import SDUNet
    from mrisr_tpu.models.vae import AutoencoderKL
    from mrisr_tpu.train.latent import (
        make_adapter_train_step,
        make_controlnet_train_step,
        make_lora_train_step,
    )
    from mrisr_tpu.train.state import create_train_state, make_lr_schedule, make_optimizer
    from mrisr_tpu.utils.checkpoint import CheckpointManager
    from mrisr_tpu.utils.logging import MetricLogger

    key = jax.random.PRNGKey(args.seed)
    res = args.resolution
    if args.tiny:
        unet_cfg = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
        vae_cfg = dict(block_out_channels=(8, 8, 16, 16))
        ctx_dim, ctx_len = 16, 7
    else:
        unet_cfg, vae_cfg = {}, {}
        ctx_dim, ctx_len = 768, 77
    unet = SDUNet(**unet_cfg)
    vae = AutoencoderKL(**vae_cfg)
    sched = sd15_schedule()

    lat = jnp.zeros((1, res // 8, res // 8, 4))
    t0 = jnp.array([1])
    ctx0 = jnp.zeros((1, ctx_len, ctx_dim))
    k1, k2, k3 = jax.random.split(key, 3)
    unet_params = unet.init(k1, lat, t0, ctx0)
    vae_params = vae.init(k2, jnp.zeros((1, res, res, 3)))
    if args.weights_dir:
        from pathlib import Path

        from mrisr_tpu.models.convert import load_params_npz

        wd = Path(args.weights_dir)
        if (wd / "unet.npz").exists():
            unet_params = load_params_npz(wd / "unet.npz")
        if (wd / "vae.npz").exists():
            vae_params = load_params_npz(wd / "vae.npz")
    # Fixed-prompt conditioning (res_srdiff.py:125-130): one frozen embedding.
    prompt_embeds = jax.random.normal(k3, (1, ctx_len, ctx_dim)) * 0.02
    empty_embeds = jnp.zeros((1, ctx_len, ctx_dim))

    frozen = {"unet": unet_params, "vae": vae_params}
    lr_sched = make_lr_schedule("cosine", args.lr, args.warmup, args.steps)
    tx = make_optimizer(
        lr_sched, kind="adamw", max_grad_norm=1.0, grad_accum=args.grad_accum
    )
    if args.mode == "controlnet":
        cn = ControlNet(
            block_out_channels=unet.block_out_channels,
            heads=unet.heads, context_dim=unet.context_dim,
        )
        train_params = cn.init(k1, lat, t0, ctx0, jnp.zeros((1, res, res, 3)))
        apply_fn = cn.apply
        step = make_controlnet_train_step(
            unet, cn, vae, sched, prompt_embeds, empty_embeds,
            args.proportion_empty_prompts,
        )
    elif args.mode == "lora":
        train_params = init_lora_params(k1, unet_params, rank=args.lora_rank)
        apply_fn = unet.apply
        step = make_lora_train_step(
            unet, vae, sched, prompt_embeds, unet_params,
            empty_embeds=empty_embeds,
            proportion_empty_prompts=args.proportion_empty_prompts,
        )
    else:
        ad = T2IAdapter(channels=unet.block_out_channels)
        train_params = ad.init(k1, jnp.zeros((1, res, res, 3)))
        apply_fn = ad.apply
        step = make_adapter_train_step(unet, ad, vae, sched, prompt_embeds)

    state = create_train_state(apply_fn, train_params, tx)
    mgr = CheckpointManager(f"{args.out}/ckpt")
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")
    logger = MetricLogger(args.out)

    ds = _resolve_dataset(args)
    loader = Loader(ds, batch_size=args.batch, shuffle=True, seed=args.seed)
    i = int(state.step)
    while i < args.steps:
        for batch in loader:
            if i >= args.steps:
                break
            b = {
                "lr": jnp.asarray(np.asarray(batch["lr"], np.float32)),
                "hr": jnp.asarray(np.asarray(batch["hr"], np.float32)),
            }
            state, m = step(state, frozen, b, jax.random.fold_in(key, i))
            if i % 50 == 0:
                logger.log(i, m)
            if i > 0 and i % 200 == 0:  # checkpointing_steps: 200 (cell 11)
                mgr.save(i, state)
            i += 1
    mgr.save(i, state, force=True)
    mgr.close()
    return 0


def _build_cache(args):
    from mrisr_tpu.data.slicecache import build_cache_from_dataset

    ds = _resolve_dataset(args)
    cache = build_cache_from_dataset(ds, args.out)
    print(f"cached {cache.n} slices ({cache.height}x{cache.width}) -> {args.out}")
    cache.close()
    return 0


def _stats(args):
    import json

    from mrisr_tpu.data.bids import dataset_stats

    report = dataset_stats(args.data_dir)
    text = json.dumps(report, indent=2, sort_keys=True)
    print(text)
    if args.out:
        from pathlib import Path

        Path(args.out).write_text(text)
    return 0


def _resolve_dataset(args):
    from mrisr_tpu.data.datasets import FastMRISliceDataset

    if getattr(args, "cache", None):
        from mrisr_tpu.data.slicecache import SliceCacheDataset

        return SliceCacheDataset(args.cache)
    if getattr(args, "index", None):
        return FastMRISliceDataset(
            json_path=args.index, target_size=(args.resolution, args.resolution)
        )
    # Hermetic fallback: synthetic phantom slices (documented; real runs
    # pass --index to use the FastMRI DICOM tree).
    import numpy as np

    from mrisr_tpu.data.degrade import simulate_low_res_np

    class Phantom:
        def __init__(self, n=64, res=args.resolution):
            self.n, self.res = n, res
            yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
            self.grid = (yy, xx)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            yy, xx = self.grid
            r = self.res
            img = np.zeros((r, r), np.float32)
            for _ in range(6):
                cy, cx = rng.uniform(r * 0.2, r * 0.8, 2)
                a, b = rng.uniform(r * 0.05, r * 0.3, 2)
                img += rng.uniform(0.2, 1.0) * np.exp(
                    -(((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2)
                )
            img = np.clip(img, 0, 1)
            lr = simulate_low_res_np(img, 4.0)
            return {"hr": img[..., None], "lr": lr[..., None]}

    return Phantom()


def _sr_volume(args):
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.pipelines.volume import super_resolve_volume
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.utils.checkpoint import CheckpointManager

    key = jax.random.PRNGKey(args.seed)
    cnn = SimpleCNN()
    unet = ResDiffUNet(image_size=args.resolution)
    cnn_params = cnn.init(key, jnp.zeros((1, args.resolution, args.resolution, 1)))
    unet_params = unet.init(
        key, jnp.zeros((1, args.resolution, args.resolution, 2)), jnp.array([0.5])
    )
    if args.checkpoint:
        state = create_train_state(unet.apply, unet_params, make_optimizer(1e-5))
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore(state)
        unet_params = restored.ema_params or restored.params
        mgr.close()
    pipe = ResDiffPipeline(cnn, unet, resdiff_schedule(1000), cnn_params, unet_params)
    out = super_resolve_volume(
        pipe,
        args.input,
        args.output,
        resolution=args.resolution,
        batch_size=args.batch,
        num_steps=args.ddim_steps,
        chain_group=args.chains,
    )
    print(f"wrote {args.output} shape={out.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
