"""Fidelity-parity harness: train the hermetic configs, record metrics.

BASELINE.md demands PSNR parity with the reference pipeline; the only
reproducible fidelity anchor the reference publishes is the Stage-1 CNN on
FastMRI (PSNR 27.92 +/- 3.39 dB, SSIM 0.859, NMSE 0.180, HFEN 1.052 —
``ResDif_execution.ipynb`` cell 32 saved output; SURVEY.md §6).

This harness produces evidence, not claims:

* ``mnist`` — the reference's shipped MNIST regression (cell 9) trained to
  convergence, PSNR vs the bicubic baseline it must beat.
* ``phantom_cnn`` — Stage-1 SimpleCNN on synthetic phantoms with the same
  x4 degradation model as the FastMRI path (``_simulate_low_res``), all
  four metrics plus the bicubic baseline.
* ``phantom_resdiff`` — short Stage-2 diffusion run + K-step sample; checks
  the sampler improves on (or at least tracks) the Stage-1 output.
* ``fastmri_cnn`` — when a real patient index is supplied, reproduces the
  cell-32 evaluation against the published anchor.

Run: ``python -m mrisr_tpu.cli parity --out PARITY.json`` (CPU-safe).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

REFERENCE_ANCHORS = {
    "fastmri_cnn": {"psnr": 27.9176, "ssim": 0.8590, "nmse": 0.1796, "hfen": 1.0523},
    "source": "ResDif_execution.ipynb cell 32 saved output (SURVEY.md §6)",
}


def _metrics(sr: np.ndarray, hr: np.ndarray) -> dict:
    from mrisr_tpu.eval.metrics import compute_mri_metrics

    p, s, n, h = compute_mri_metrics(
        np.clip(sr, 0, 1).transpose(0, 3, 1, 2), np.clip(hr, 0, 1).transpose(0, 3, 1, 2)
    )
    return {
        "psnr": float(p),
        "ssim": float(s),
        "nmse": float(n),
        "hfen": float(h),
    }


def _metrics_per_image(sr: np.ndarray, hr: np.ndarray) -> dict:
    """Per-image metric arrays (lists of floats), NHWC inputs."""
    from mrisr_tpu.eval.metrics import compute_mri_metrics_per_image

    p, s, n, h = compute_mri_metrics_per_image(
        np.clip(sr, 0, 1).transpose(0, 3, 1, 2), np.clip(hr, 0, 1).transpose(0, 3, 1, 2)
    )
    return {
        "psnr": np.asarray(p).astype(float).tolist(),
        "ssim": np.asarray(s).astype(float).tolist(),
        "nmse": np.asarray(n).astype(float).tolist(),
        "hfen": np.asarray(h).astype(float).tolist(),
    }


def _paired_delta_stats(
    exact: np.ndarray, other: np.ndarray, n_seeds: int = 1
) -> dict:
    """Paired per-sample delta statistics with a 95% t-CI.

    ``delta = exact - other`` per paired sample (positive = ``other`` worse),
    so for PSNR the machine-checkable 0.1 dB criterion is
    ``ci95[1] < 0.1`` — the upper confidence bound on the mean fidelity
    LOSS of a serving profile vs exact reference semantics (VERDICT
    round-2 items 1/7: a point estimate of 0.07 dB cannot be
    distinguished from 0.12 without the interval).

    ``n_seeds``: when the flat arrays are SEED-MAJOR stacks of
    ``n_seeds`` sampler-seed replicates of the same image set, the flat
    t-CI treats correlated replicates as independent and is too tight
    (VERDICT round-4 weak #2).  ``n_seeds > 1`` adds a
    ``clustered_by_image`` block that first averages the seed replicates
    per image and computes the CI over the ``n / n_seeds`` independent
    images — the conservative, decision-grade interval.
    """
    from scipy import stats

    def _tstats(delta: np.ndarray) -> dict:
        n = delta.size
        mean = float(delta.mean())
        sd = float(delta.std(ddof=1)) if n > 1 else 0.0
        half = float(stats.t.ppf(0.975, n - 1) * sd / np.sqrt(n)) if n > 1 else 0.0
        return {
            "n": int(n),
            "mean": mean,
            "std": sd,
            "ci95": [mean - half, mean + half],
            "max": float(delta.max()),
            "min": float(delta.min()),
        }

    delta = np.asarray(exact, np.float64) - np.asarray(other, np.float64)
    out = _tstats(delta)
    if n_seeds > 1 and delta.size % n_seeds == 0:
        per_image = delta.reshape(n_seeds, delta.size // n_seeds).mean(axis=0)
        out["clustered_by_image"] = _tstats(per_image)
    return out


def _phantom_batches(
    n: int,
    res: int,
    seed0: int = 0,
    textured: bool = True,
    degrade_scale: float = 4.0,
    texture_mode: str = "recoverable",
):
    """Synthetic HR/LR pairs.

    ``textured=False`` is the round-2..4 generator: 6 smooth Gaussian blobs.
    VERDICT round-1 found it a weak fidelity vehicle — Stage-1 near-solves
    it (48 dB), local variance ~ 0 makes SSIM meaningless, and the diffusion
    stage can only add noise.  ``textured=True`` adds the content MRI
    actually has; ``texture_mode`` controls its information structure:

    * ``"legacy"`` — the first textured generator: random band-limited
      noise at 0.08-0.25 cycles/px.  Measured flaw: the degradation blur
      (sigma = 0.5*scale) DESTROYS that band (MTF < 0.05 at scale>=4 for
      r >= 0.15), so the texture is unrecoverable from LR.  On
      unrecoverable content a posterior SAMPLER provably loses PSNR to a
      mean predictor (sample error ~ sqrt(2) x MMSE error), so this
      workload structurally favors Stage-1 — the opposite of the
      reference's MRI regime (cells 40/46), where the detail the CNN
      blurs away IS still attenuated-but-present in the input.
    * ``"recoverable"`` (default) — texture the degradation attenuates but
      does not destroy: (a) random band-limited texture moved down to
      0.04-0.11 cycles/px (blur MTF 0.25-0.85 at scale=4: present in LR,
      needs real deconvolution — beyond SimpleCNN's 7x7 receptive field,
      squarely in the diffusion UNet's); (b) ridge texture that is a
      DETERMINISTIC function of the smooth anatomy, sin(2*pi*k*phi(x)),
      whose fine structure the blur removes but whose generating field
      phi survives — exactly recoverable by a model with enough context
      and capacity, invisible to a 3-conv stage 1; (c) vessel-like lines
      widened to ~2 px so they survive scale=4 partially (1 px lines at
      the legacy amplitudes are invisible in LR, i.e. pure hallucination
      bait that again penalises sampling).

    ``degrade_scale`` feeds the reference's ``_simulate_low_res``
    (blur sigma = 0.5*scale + bicubic down/up).
    """
    from scipy.ndimage import gaussian_filter

    from mrisr_tpu.data.degrade import simulate_low_res_np

    hrs, lrs = [], []
    for i in range(n):
        rng = np.random.default_rng(seed0 + i)
        yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
        img = np.zeros((res, res), np.float32)
        for _ in range(6):
            cy, cx = rng.uniform(res * 0.2, res * 0.8, 2)
            a, b = rng.uniform(res * 0.05, res * 0.3, 2)
            img += rng.uniform(0.2, 1.0) * np.exp(
                -(((yy - cy) / a) ** 2 + ((xx - cx) / b) ** 2)
            )
        if textured:
            legacy = texture_mode == "legacy"
            gate = np.clip(img / 0.3, 0.0, 1.0)
            # Random band-limited texture gated to tissue.  Band per mode:
            # legacy 0.08-0.25 (destroyed by the blur), recoverable
            # 0.04-0.11 (attenuated, still in LR).
            lo, hi, amp = (0.08, 0.25, 0.15) if legacy else (0.04, 0.11, 0.12)
            f = np.fft.fft2(rng.standard_normal((res, res)).astype(np.float32))
            fy = np.fft.fftfreq(res)[:, None]
            fx = np.fft.fftfreq(res)[None, :]
            r = np.sqrt(fy**2 + fx**2)
            band = ((r > lo) & (r < hi)).astype(np.float32)
            tex = np.fft.ifft2(f * band).real.astype(np.float32)
            tex /= max(float(tex.std()), 1e-6)
            img += amp * tex * gate
            if not legacy:
                # Deterministic ridge texture: phase locked to the smooth
                # anatomy field, so HR detail is a function of information
                # that survives the degradation.
                phi = gaussian_filter(img, sigma=res * 0.02)
                img += 0.12 * np.sin(2.0 * np.pi * 6.0 * phi) * gate
            # Curvilinear vessel-like structure.
            n_vessels = 4 if legacy else 3
            for _ in range(n_vessels):
                t = np.linspace(0, 1, res * 4, dtype=np.float32)
                x0, y0 = rng.uniform(0.1 * res, 0.9 * res, 2)
                ang = rng.uniform(0, 2 * np.pi)
                amp_w = rng.uniform(0.05, 0.2) * res
                freq = rng.uniform(1.0, 3.0)
                length = rng.uniform(0.3, 0.8) * res
                wave = amp_w * np.sin(2 * np.pi * freq * t)
                cxs = x0 + t * length * np.cos(ang) + wave * np.sin(ang)
                cys = y0 + t * length * np.sin(ang) - wave * np.cos(ang)
                ix = np.clip(cxs.astype(int), 0, res - 1)
                iy = np.clip(cys.astype(int), 0, res - 1)
                v = np.zeros_like(img)
                v[iy, ix] = 1.0
                if not legacy:
                    # ~2 px wide: survives scale=4 partially instead of
                    # vanishing entirely (see docstring).
                    v = np.minimum(gaussian_filter(v, sigma=0.8) * 2.5, 1.0)
                img += rng.uniform(0.3, 0.6) * v
        img = np.clip(img, 0, 1)
        hrs.append(img[..., None])
        lrs.append(simulate_low_res_np(img, degrade_scale)[..., None])
    return np.stack(lrs), np.stack(hrs)


def run_mnist(steps: int = 300, batch: int = 64) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.data.datasets import MNISTSRDataset
    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.models.mnist_unet import MNISTUNet
    from mrisr_tpu.ops.resize import interpolate_like_torch
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_mnist_regression_step

    key = jax.random.PRNGKey(0)
    ds = MNISTSRDataset(None)
    loader = Loader(ds, batch_size=batch, shuffle=True, seed=0)
    model = MNISTUNet(num_classes=10)
    params = model.init(
        key, jnp.zeros((1, 28, 28, 1)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
    )
    state = create_train_state(model.apply, params, make_optimizer(1e-3))
    step = make_mnist_regression_step(model)

    def upsample(lr):
        return np.asarray(
            interpolate_like_torch(jnp.asarray(lr).transpose(0, 3, 1, 2), (28, 28))
        ).transpose(0, 2, 3, 1)

    i = 0
    while i < steps:
        for b in loader:
            if i >= steps:
                break
            bb = {
                "hr": jnp.asarray(b["hr"]),
                "lr_up": jnp.asarray(upsample(b["lr"])),
                "label": jnp.asarray(b["label"]),
            }
            state, m = step(state, bb, jax.random.fold_in(key, i))
            i += 1

    val = [ds[j] for j in range(64)]
    hr = np.stack([v["hr"] for v in val])
    lr_up = upsample(np.stack([v["lr"] for v in val]))
    pred = np.asarray(model.apply(state.params, jnp.asarray(lr_up), None, None))
    return {
        "steps": steps,
        "model": _metrics(pred, hr),
        "bicubic_baseline": _metrics(lr_up, hr),
    }


def run_phantom_cnn(
    steps: int = 400,
    res: int = 64,
    batch: int = 8,
    n_train: int = 64,
    textured: bool = True,
    degrade_scale: float = 4.0,
    texture_mode: str = "recoverable",
) -> dict:
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_cnn_train_step

    key = jax.random.PRNGKey(0)
    cnn = SimpleCNN()
    params = cnn.init(key, jnp.zeros((1, res, res, 1)))
    state = create_train_state(cnn.apply, params, make_optimizer(1e-4))
    lr_all, hr_all = _phantom_batches(
        n_train, res, textured=textured, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    # Scanned dispatch (train/steps.py::make_cnn_train_many): K steps per
    # jitted program over the device-resident set — same batch-index
    # sequence as the historical per-step loop, ~K-fold fewer relay RPCs.
    from mrisr_tpu.train.steps import make_cnn_train_many

    many = make_cnn_train_many(cnn)
    lr_dev, hr_dev = jnp.asarray(lr_all), jnp.asarray(hr_all)
    chunk = min(1000, steps)
    steps = (steps // chunk) * chunk
    for s0 in range(0, steps, chunk):
        idx = np.stack(
            [
                np.random.default_rng(i).integers(0, len(lr_all), batch)
                for i in range(s0, s0 + chunk)
            ]
        )
        state, losses = many(state, lr_dev, hr_dev, jnp.asarray(idx))

    lr_te, hr_te = _phantom_batches(
        32, res, seed0=1000, textured=textured, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    pred = np.asarray(cnn.apply(state.params, jnp.asarray(lr_te)))
    return {
        "steps": steps,
        "model": _metrics(pred, hr_te),
        "bicubic_baseline": _metrics(lr_te, hr_te),
        "cnn_params": state.params,  # handed to run_phantom_resdiff; stripped from JSON
    }


def run_phantom_resdiff(
    cnn_result: dict,
    steps: int = 300,
    res: int = 64,
    batch: int = 8,
    sample_steps: tuple = (10, 50, 250, 1000),
    n_train: int = 64,
    lr_schedule: str = "constant",
    ema_decay: float = 0.99,
    textured: bool = True,
    degrade_scale: float = 4.0,
    ca_kv_pool: int = 0,
    texture_mode: str = "recoverable",
    eval_every: int = 0,
    ckpt_path: str | None = None,
    resume_ckpt: str | None = None,
    inner_channel: int = 16,
    n_test: int = 16,
    sample_seeds: tuple = (2,),
    chunk_steps: int = 0,
    profile_steps: int = 50,
) -> dict:
    """Stage-2 training + profile fidelity evaluation.

    ``n_test`` held-out images x ``len(sample_seeds)`` sampler seeds feed
    the paired per-image statistics (VERDICT round-2 item 7).
    ``chunk_steps`` bounds the per-dispatch scanned-training length
    independently of the ``eval_every`` cadence — through the axon relay a
    dispatch must stay under ~60-90 s of chip time (PERF.md round-8), which
    at 256^2 means ~250-500 train steps even when evals are sparser.
    """
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import resdiff_schedule
    from mrisr_tpu.models.resdiff_unet import ResDiffUNet
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.pipelines.resdiff import ResDiffPipeline
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_resdiff_train_many

    key = jax.random.PRNGKey(1)
    cnn = SimpleCNN()
    cnn_params = cnn_result["cnn_params"]
    unet = ResDiffUNet(
        image_size=res, inner_channel=inner_channel, norm_groups=8,
        ca_kv_pool=ca_kv_pool,
    )
    params = unet.init(key, jnp.zeros((1, res, res, 2)), jnp.array([0.5]))
    sched = resdiff_schedule(1000)
    if lr_schedule == "cosine":
        import optax

        opt = make_optimizer(
            optax.cosine_decay_schedule(2e-4, max(steps, 1), alpha=0.05)
        )
    else:
        opt = make_optimizer(2e-4)
    state = create_train_state(unet.apply, params, opt, ema_decay=ema_decay)

    lr_all, hr_all = _phantom_batches(
        n_train, res, textured=textured, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    lr_te, hr_te = _phantom_batches(
        n_test, res, seed0=1000, textured=textured, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    cnn_apply = jax.jit(cnn.apply)
    pipe = ResDiffPipeline(cnn, unet, sched, cnn_params, state.ema_params)

    start = 0
    if resume_ckpt and Path(resume_ckpt).exists():
        from flax import serialization

        raw = Path(resume_ckpt).read_bytes()
        # Round-3 checkpoints carry the optimizer state so a crash-resume
        # neither resets Adam moments nor restarts the cosine LR schedule
        # (both live in opt_state, not in state.step).  Fall back to the
        # round-2 {params, ema, step} layout for older artifacts.
        try:
            blob = serialization.from_bytes(
                {"params": state.params, "ema": state.ema_params,
                 "opt_state": state.opt_state, "step": 0},
                raw,
            )
            state = state.replace(
                params=blob["params"], ema_params=blob["ema"],
                opt_state=blob["opt_state"], step=jnp.asarray(blob["step"]),
            )
        except Exception:
            blob = serialization.from_bytes(
                {"params": state.params, "ema": state.ema_params, "step": 0},
                raw,
            )
            state = state.replace(
                params=blob["params"], ema_params=blob["ema"],
                step=jnp.asarray(blob["step"]),
            )
        start = int(blob["step"])
        print(f"[resdiff] resumed from {resume_ckpt} at step {start}", flush=True)

    # Scanned training dispatch (train/steps.py::make_resdiff_train_many):
    # the stage-1 SR of the whole train set is chain-invariant, so it is
    # computed ONCE and the scan gathers (sr, hr) batches on device.  Batch
    # indices and per-step keys reproduce the historical per-step loop.
    many = make_resdiff_train_many(unet, sched)
    sr_dev = cnn_apply(cnn_params, jnp.asarray(lr_all))
    hr_dev = jnp.asarray(hr_all)
    chunk = chunk_steps or (eval_every if eval_every else min(1000, max(steps, 1)))
    if eval_every and eval_every % chunk:
        raise ValueError(
            f"eval_every ({eval_every}) must be a multiple of the dispatch "
            f"chunk ({chunk})"
        )
    steps = (steps // chunk) * chunk if steps >= chunk else 0
    for s0 in range(start, steps, chunk):
        idx = np.stack(
            [
                np.random.default_rng(10_000 + i).integers(0, len(lr_all), batch)
                for i in range(s0, s0 + chunk)
            ]
        )
        state, losses = many(
            state, sr_dev, hr_dev, jnp.asarray(idx),
            jnp.arange(s0, s0 + chunk), key,
        )
        done = s0 + chunk
        if eval_every and (done % eval_every == 0 or done == steps):
            out = np.asarray(
                pipe.super_resolve_with(
                    cnn_params, state.ema_params, jnp.asarray(lr_te[:8]),
                    jax.random.PRNGKey(2), num_steps=50,
                )
            )
            mm = _metrics(out, hr_te[:8])
            print(
                f"[resdiff {done}/{steps}] loss={float(losses[-1]):.5f} "
                f"50-step psnr={mm['psnr']:.2f} ssim={mm['ssim']:.4f}",
                flush=True,
            )
            if ckpt_path:
                # Crash insurance for multi-hour runs: EMA + train params +
                # full optimizer state, written atomically (tmp + rename) so
                # a crash mid-write never corrupts the resume point.
                from flax import serialization

                tmp = Path(str(ckpt_path) + ".tmp")
                tmp.write_bytes(
                    serialization.to_bytes(
                        {"params": state.params, "ema": state.ema_params,
                         "opt_state": state.opt_state, "step": done}
                    )
                )
                tmp.replace(ckpt_path)
    # Rebind with the TRAINED EMA params (the pre-loop pipe instance only
    # serves super_resolve_with, which takes params as traced arguments).
    pipe = ResDiffPipeline(cnn, unet, sched, cnn_params, state.ema_params)

    def _sample(unet_obj, seed: int, nsteps: int) -> np.ndarray:
        """Sample the whole held-out set through one serving profile.

        One dispatch; when ``n_test`` is a multiple of ``batch`` the set
        runs as G sequential bs-sized chains via ``super_resolve_many`` —
        the production dispatch shape, and it keeps a single chain's live
        set on device at a time (64 test images at 256^2 would otherwise
        blow past sensible batch sizes).  The per-chain keys depend only on
        (seed, chain index), so every profile sees IDENTICAL noise
        realizations per (image, seed) — the paired-statistics requirement.
        """
        p = ResDiffPipeline(cnn, unet_obj, sched, cnn_params, state.ema_params)
        lr_dev_te = jnp.asarray(lr_te)
        if n_test > batch and n_test % batch == 0:
            G = n_test // batch
            stack = lr_dev_te.reshape((G, batch) + lr_te.shape[1:])
            keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                jax.random.PRNGKey(seed), jnp.arange(G)
            )
            out = p.super_resolve_many(
                cnn_params, state.ema_params, stack, keys, num_steps=nsteps
            )
            return np.asarray(out).reshape(lr_te.shape)
        return np.asarray(
            p.super_resolve(lr_dev_te, jax.random.PRNGKey(seed), num_steps=nsteps)
        )

    seed0 = int(sample_seeds[0])
    # Sampling-chain-length sweep: the reference validates with the FULL
    # 1000-step chain (cell 46 swaps the noise schedule to 'val'); short
    # DDIM chains trade fidelity for speed.
    by_steps = {}
    for k in sample_steps:
        by_steps[str(k)] = _metrics(_sample(unet, seed0, int(k)), hr_te)
    best = max(by_steps.values(), key=lambda m: m["psnr"])
    stage1 = np.asarray(cnn_apply(cnn_params, jnp.asarray(lr_te)))
    # Headline = the 50-step chain (the throughput-benched configuration —
    # VERDICT round-1 weak-4: fidelity and throughput must be measured at
    # the SAME config); the best-of-chains is reported separately.
    headline = by_steps.get("50", best)
    report = {
        "steps": steps,
        "sample_steps": list(sample_steps),
        "n_test": n_test,
        "sample_seeds": [int(s) for s in sample_seeds],
        "model": headline,
        "best_chain": best,
        "by_sample_steps": by_steps,
        "stage1_cnn": _metrics(stage1, hr_te),
        "bicubic_baseline": _metrics(lr_te, hr_te),
    }
    # Serving-profile head-to-head (VERDICT round-2 items 1/4/7): the
    # kv-pooled profiles share the exact model's param tree, so the SAME
    # trained checkpoint samples through all of them.  Every profile is
    # sampled over the full held-out set x every sampler seed with noise
    # paired to the exact profile's, and reported with per-image metric
    # arrays, paired exact-vs-profile deltas, a 95% CI on the mean PSNR
    # loss, and the machine-checkable ``within_0p1db`` verdict
    # (= CI upper bound < 0.1 dB).  Only meaningful when a CA site reaches
    # the pooling gate (res >= 128) and training itself was exact.
    if ca_kv_pool == 0 and res >= 128:
        # (name, pool, min_tokens): "site-selective" pools ONLY the
        # >4096-token sites (at 256^2: the dominant 16384-token res-128
        # site; the 4096-token res-64 site stays exact) — the middle
        # profile of VERDICT round-2 item 4.  At res < 256 it equals
        # exact semantics (tested), so it is only swept at res >= 256.
        profiles = [("kv_pool_2", 2, 4096), ("kv_pool_4", 4, 4096), ("kv_pool_8", 8, 4096)]
        if res >= 256:
            profiles += [("selective_4", 4, 8192), ("selective_8", 8, 8192)]

        def eval_profile(unet_obj) -> dict:
            per_seed = [
                _metrics_per_image(_sample(unet_obj, int(s), profile_steps), hr_te)
                for s in sample_seeds
            ]
            # Pool (image, seed) pairs into flat arrays, seed-major.
            flat = {
                m: [v for ps in per_seed for v in ps[m]]
                for m in ("psnr", "ssim", "nmse", "hfen")
            }
            return {
                "mean": {m: float(np.mean(flat[m])) for m in flat},
                "per_image": flat,
            }

        exact_eval = eval_profile(unet)
        prof_report = {"sample_steps": profile_steps, "exact": exact_eval}
        for name, p, min_tok in profiles:
            unet_p = ResDiffUNet(
                image_size=res, inner_channel=inner_channel, norm_groups=8,
                ca_kv_pool=p, ca_kv_pool_min_tokens=min_tok,
            )
            ev = eval_profile(unet_p)
            n_seeds = len(sample_seeds)
            psnr_stats = _paired_delta_stats(
                exact_eval["per_image"]["psnr"], ev["per_image"]["psnr"],
                n_seeds=n_seeds,
            )
            ev["delta_vs_exact"] = {
                "psnr": psnr_stats,
                "ssim": _paired_delta_stats(
                    exact_eval["per_image"]["ssim"], ev["per_image"]["ssim"],
                    n_seeds=n_seeds,
                ),
            }
            # The gate uses the CONSERVATIVE interval: image-clustered when
            # seed replicates exist (they are correlated — VERDICT round-4
            # weak #2), flat otherwise.  The flat verdict is kept alongside
            # for artifact back-compat.
            gate = psnr_stats.get("clustered_by_image", psnr_stats)
            ev["within_0p1db"] = bool(gate["ci95"][1] < 0.1)
            ev["within_0p1db_flat"] = bool(psnr_stats["ci95"][1] < 0.1)
            ev["config"] = {"ca_kv_pool": p, "ca_kv_pool_min_tokens": min_tok}
            prof_report[name] = ev
            print(
                f"[parity profile {name}] psnr={ev['mean']['psnr']:.4f} "
                f"dpsnr={psnr_stats['mean']:+.4f} "
                f"ci95=({psnr_stats['ci95'][0]:+.4f},{psnr_stats['ci95'][1]:+.4f}) "
                f"within_0.1dB={ev['within_0p1db']}",
                flush=True,
            )
        report["profiles_50step"] = prof_report
        # Back-compat summary (the r05/r06 artifact shape).
        report["fast_profiles_50step"] = {
            str(p): prof_report[f"kv_pool_{p}"]["mean"] for p in (2, 4, 8)
        }
    return report


def run_phantom_latent(
    res: int = 64,
    n_train: int = 256,
    n_test: int = 32,
    batch: int = 8,
    vae_steps: int = 4000,
    base_steps: int = 6000,
    cn_steps: int = 3000,
    lora_steps: int = 3000,
    num_inference_steps: int = 20,
    sample_seeds: tuple = (2, 3),
    degrade_scale: float = 4.0,
    texture_mode: str = "recoverable",
    lora_rank: int = 4,
    chunk_steps: int = 0,
    prediction_type: str = "epsilon",
    vae_width: int = 16,
    unet_width: int = 32,
    adapter_steps: int = 0,
    cn_lora_steps: int = 0,
    lora_ranks: tuple = (),
    extra_sample_steps: tuple = (),
    cache_latents: bool = False,
    vae_chunk_steps: int = 0,
) -> dict:
    """Trained-model fidelity evidence for the LATENT path (BASELINE
    configs 2-3; VERDICT round-3 next #2).

    The reference's inference entry point being mirrored is
    ``src/adapters/res_srdiff.py:36-105``: VAE-encode the LR condition,
    reverse a 20-step res-shift chain with ControlNet (or LoRA-merged)
    eps-predictions, VAE-decode.  Real SD1.5 weights are env-blocked
    (zero egress), so — exactly like the ResDiff stage-2 leg — the whole
    stack is trained at phantom scale:

    1. a small ``AutoencoderKL`` (f=4: phantom texture does not survive
       f=8 at 64^2; topology otherwise identical) on the phantom images,
       with an EMPIRICAL scaling factor (latent unit-variance, the role
       0.18215 plays for SD1.5);
    2. a small ``SDUNet`` base on the res-shift objective (the stand-in
       for SD1.5 pretraining — ``train/latent.py::make_latent_base_...``);
    3. PEFT legs on the frozen base: a ``ControlNet`` (zero-init output
       convs, so an UNTRAINED ControlNet is exactly the base) and a LoRA.

    Every row is sampled through the REAL serving entry point
    (``LatentSRPipeline.super_resolve_with``) with per-(image, seed)
    paired noise, reported with per-image metric arrays and paired-delta
    CIs vs the bicubic input — the same decision-grade statistics as
    ``profiles_50step``.

    Round-5 legs (VERDICT round-4 next #1-2):

    * ``adapter_steps > 0`` — T2I-Adapter row (``src/adapters/
      modules.py:114-157`` shape, zero-init out projections so the
      untrained adapter IS the base), trained on the frozen base and
      served through the adapter mode of ``LatentSRPipeline``.
    * ``cn_lora_steps > 0`` — combined ControlNet+LoRA row, the
      reference notebook's actual configuration
      (``artificial_ds_lora_controlnet.ipynb``; both PEFT modules
      trained jointly on the frozen base).
    * ``lora_ranks`` — additional LoRA-only rows per rank (the rank
      sweep pinning whether plain LoRA's failure is rank-limited).
    * ``extra_sample_steps`` — re-sample the PEFT rows at additional
      chain lengths (e.g. 50, for the BASELINE config-2 wording:
      the harness default 20 follows ``res_srdiff.py:36``).
    * ``cache_latents`` — precompute the frozen VAE's posterior moments
      for the whole train set ONCE and sample latents in-step (the
      standard SD latent-caching optimization; distributionally
      identical, tested).  Required at 256^2 through the relay: the
      per-step pixel encodes made 250-step chunks exceed the
      per-dispatch chip-time limit and crash the worker.
    * ``vae_chunk_steps`` — separate dispatch-chunk length for the VAE
      leg (its 256^2 pixel-space steps are ~10x the cached latent
      steps; 0 = use ``chunk_steps``).
    """
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.diffusion.schedules import sd15_schedule
    from mrisr_tpu.models.controlnet import ControlNet
    from mrisr_tpu.models.lora import init_lora_params, merge_lora
    from mrisr_tpu.models.sd_unet import SDUNet
    from mrisr_tpu.models.vae import AutoencoderKL
    from mrisr_tpu.pipelines.latent import LatentSRPipeline
    from mrisr_tpu.train.latent import (
        make_controlnet_train_step,
        make_latent_base_train_step,
        make_lora_train_step,
        make_vae_train_step,
    )
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    lr_all, hr_all = _phantom_batches(
        n_train, res, textured=True, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    lr_te, hr_te = _phantom_batches(
        n_test, res, seed0=1000, textured=True, degrade_scale=degrade_scale,
        texture_mode=texture_mode,
    )
    # Model space is [-1, 1] (the SD/VAE convention); metrics in [0, 1].
    to_pm1 = lambda a: (a * 2.0 - 1.0).astype(np.float32)
    to_unit = lambda a: np.clip((np.asarray(a, np.float32) + 1.0) / 2.0, 0.0, 1.0)
    gray = lambda a: np.mean(np.asarray(a, np.float32), axis=-1, keepdims=True)

    w = vae_width
    vae_cfg = dict(block_out_channels=(w, 2 * w, 4 * w), latent_channels=4)
    vae = AutoencoderKL(**vae_cfg)
    key = jax.random.PRNGKey(0)
    vae_params = vae.init(key, jnp.zeros((1, res, res, 3)))
    vstate = create_train_state(vae.apply, vae_params, make_optimizer(1e-3))
    vstep = make_vae_train_step(vae)
    # Train on BOTH marginals the pipeline encodes (HR targets + LR anchors).
    pool = np.concatenate([to_pm1(hr_all), to_pm1(lr_all)])
    if chunk_steps > 0:
        # Scanned-training dispatch (``make_vae_train_many``): K steps per
        # jitted program over the device-resident pool — chip-bound instead
        # of RPC-bound through the relay; identical trajectory to the loop
        # (same per-step idx rng + fold_in walk).
        from mrisr_tpu.train.latent import make_vae_train_many

        vmany = make_vae_train_many(vstep)
        pool_dev = jnp.asarray(pool)
        done = 0
        vchunk = vae_chunk_steps or chunk_steps
        while done < vae_steps:
            k = min(vchunk, vae_steps - done)
            ids = np.arange(done, done + k)
            idx = np.stack(
                [np.random.default_rng(int(s)).integers(0, len(pool), batch) for s in ids]
            )
            vstate, vlosses = vmany(
                vstate, pool_dev, jnp.asarray(idx), jnp.asarray(ids), key
            )
            done += k
            print(
                f"[latent vae {done}/{vae_steps}] rec={float(vlosses[-1, 1]):.5f} "
                f"kl={float(vlosses[-1, 2]):.2f}",
                flush=True,
            )
    else:
        for i in range(vae_steps):
            idx = np.random.default_rng(i).integers(0, len(pool), batch)
            vstate, vm = vstep(
                vstate, {"img": jnp.asarray(pool[idx])}, jax.random.fold_in(key, i)
            )
            if (i + 1) % max(vae_steps // 4, 1) == 0:
                print(
                    f"[latent vae {i+1}/{vae_steps}] rec={float(vm['rec']):.5f} "
                    f"kl={float(vm['kl']):.2f}",
                    flush=True,
                )
    vae_params = vstate.params

    # Empirical latent scaling: unit-variance latents for the diffusion
    # (what 0.18215 is for SD1.5's VAE).
    rgb = lambda a: jnp.repeat(jnp.asarray(a), 3, axis=-1)
    enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    lat_sample = np.asarray(enc(vae_params, rgb(to_pm1(hr_all[:64]))))
    scaling = float(1.0 / max(lat_sample.std(), 1e-6))
    vae_s = AutoencoderKL(**vae_cfg, scaling_factor=scaling)

    # VAE reconstruction ceiling: nothing sampled in latent space can beat
    # decode(encode(HR)) — reported so the latent rows are interpretable.
    rec_te = np.asarray(
        jax.jit(lambda p, x: vae.apply(p, x))(vae_params, rgb(to_pm1(hr_te)))
    )
    vae_ceiling = _metrics(gray(to_unit(rec_te)), hr_te)
    print(f"[latent vae] recon ceiling psnr={vae_ceiling['psnr']:.2f}", flush=True)

    f = res // (2 ** (len(vae_cfg["block_out_channels"]) - 1))
    uw = unet_width
    unet = SDUNet(block_out_channels=(uw, 2 * uw, 2 * uw, 2 * uw), heads=2, context_dim=16)
    cn = ControlNet(
        block_out_channels=(uw, 2 * uw, 2 * uw, 2 * uw), heads=2, context_dim=16,
        cond_block_channels=(8, 16, 32),
    )
    sched = sd15_schedule()
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    lat0 = jnp.zeros((1, f, f, 4))
    ctx0 = jnp.zeros((1, 7, 16))
    base_params = unet.init(k1, lat0, jnp.array([1]), ctx0)
    cn_params0 = cn.init(
        k2, lat0, jnp.array([1]), ctx0, jnp.zeros((1, res, res, 3))
    )
    prompt = jax.random.normal(jax.random.PRNGKey(42), (1, 7, 16), jnp.float32)
    empty = jnp.zeros((1, 7, 16), jnp.float32)

    hr_pm1, lr_pm1 = to_pm1(hr_all), to_pm1(lr_all)

    # Latent cache: the frozen VAE's posterior moments for the whole train
    # set, computed once (train/latent.py::_encode_pair samples in-step).
    arrays_dev = None
    if cache_latents:
        mom = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_moments))
        parts = {k: [] for k in ("hr_mean", "hr_logvar", "lr_mean", "lr_logvar")}
        for s0 in range(0, n_train, 64):
            hm, hv = mom(vae_params, rgb(hr_pm1[s0 : s0 + 64]))
            lm, lv = mom(vae_params, rgb(lr_pm1[s0 : s0 + 64]))
            for k_, v_ in zip(parts, (hm, hv, lm, lv)):
                parts[k_].append(np.asarray(v_))
        arrays_dev = {k: jnp.asarray(np.concatenate(v)) for k, v in parts.items()}
        arrays_dev["lr"] = jnp.asarray(lr_pm1)  # pixels for cond branches
        print(
            f"[latent cache] moments cached for {n_train} pairs "
            f"({arrays_dev['hr_mean'].shape})",
            flush=True,
        )

    def train_loop(state, step_fn, frozen, steps, tag, seed0=0):
        if chunk_steps > 0:
            from mrisr_tpu.train.latent import (
                make_latent_train_many,
                make_latent_train_many_cached,
            )

            if cache_latents:
                many = make_latent_train_many_cached(step_fn)
            else:
                many = make_latent_train_many(step_fn)
                lr_dev, hr_dev = jnp.asarray(lr_pm1), jnp.asarray(hr_pm1)
            done = 0
            while done < steps:
                k = min(chunk_steps, steps - done)
                ids = np.arange(seed0 + done, seed0 + done + k)
                idx = np.stack(
                    [np.random.default_rng(int(s)).integers(0, n_train, batch) for s in ids]
                )
                if cache_latents:
                    state, losses = many(
                        state, frozen, arrays_dev,
                        jnp.asarray(idx), jnp.asarray(ids), key,
                    )
                else:
                    state, losses = many(
                        state, frozen, lr_dev, hr_dev,
                        jnp.asarray(idx), jnp.asarray(ids), key,
                    )
                done += k
                print(
                    f"[latent {tag} {done}/{steps}] loss={float(losses[-1]):.5f}",
                    flush=True,
                )
            return state
        for i in range(steps):
            idx = np.random.default_rng(seed0 + i).integers(0, n_train, batch)
            if cache_latents:
                b = {k: v[jnp.asarray(idx)] for k, v in arrays_dev.items()}
            else:
                b = {"hr": jnp.asarray(hr_pm1[idx]), "lr": jnp.asarray(lr_pm1[idx])}
            state, m = step_fn(state, frozen, b, jax.random.fold_in(key, seed0 + i))
            if (i + 1) % max(steps // 4, 1) == 0:
                print(f"[latent {tag} {i+1}/{steps}] loss={float(m['loss']):.5f}", flush=True)
        return state

    # 2) base UNet (stand-in for SD1.5 pretraining)
    bstate = create_train_state(unet.apply, base_params, make_optimizer(2e-4))
    bstep = make_latent_base_train_step(
        unet, vae_s, sched, prompt, empty, prediction_type=prediction_type,
        latents_cached=cache_latents,
    )
    bstate = train_loop(bstate, bstep, {"vae": vae_params}, base_steps, "base", 10_000)
    base_params = bstate.params

    # 3a) ControlNet on the frozen base
    cstate = create_train_state(cn.apply, cn_params0, make_optimizer(2e-4))
    cstep = make_controlnet_train_step(
        unet, cn, vae_s, sched, prompt, empty, prediction_type=prediction_type,
        latents_cached=cache_latents,
    )
    cstate = train_loop(
        cstate, cstep, {"unet": base_params, "vae": vae_params}, cn_steps, "cn", 20_000
    )

    # 3b) LoRA on the frozen base — primary rank plus the optional sweep.
    def train_lora(rank: int, seed0: int, init_seed: int):
        lora0 = init_lora_params(jax.random.PRNGKey(init_seed), base_params, rank=rank)
        lstate = create_train_state(None, lora0, make_optimizer(1e-3))
        lstep = make_lora_train_step(
            unet, vae_s, sched, prompt, base_params, prediction_type=prediction_type,
            latents_cached=cache_latents,
        )
        lstate = train_loop(
            lstate, lstep, {"vae": vae_params}, lora_steps, f"lora_r{rank}", seed0
        )
        return merge_lora(base_params, lstate.params)

    lora_merged = train_lora(lora_rank, 30_000, 5)
    sweep_merged = {}
    for j, r in enumerate(lora_ranks):
        if int(r) == lora_rank:
            continue
        sweep_merged[int(r)] = train_lora(int(r), 70_000 + j * 10_000, 500 + j)

    # 3c) combined ControlNet + LoRA (the reference notebook's actual
    # configuration — artificial_ds_lora_controlnet.ipynb, SURVEY top note).
    cl_params = None
    if cn_lora_steps > 0:
        import optax

        from mrisr_tpu.train.latent import make_cn_lora_train_step

        cl0 = {
            "cn": cn_params0,
            "lora": init_lora_params(jax.random.PRNGKey(6), base_params, rank=lora_rank),
        }
        tx = optax.multi_transform(
            {"cn": make_optimizer(2e-4), "lora": make_optimizer(1e-3)},
            {"cn": "cn", "lora": "lora"},
        )
        clstate = create_train_state(None, cl0, tx)
        clstep = make_cn_lora_train_step(
            unet, cn, vae_s, sched, prompt, base_params,
            empty_embeds=empty, prediction_type=prediction_type,
            latents_cached=cache_latents,
        )
        clstate = train_loop(
            clstate, clstep, {"vae": vae_params}, cn_lora_steps, "cn_lora", 50_000
        )
        cl_params = clstate.params

    # 3d) T2I-Adapter on the frozen base (reference shape
    # src/adapters/modules.py:114-157 scaled to phantom widths; zero-init
    # out projections so untrained == base — see models/adapter.py).
    ad = ad_params = None
    if adapter_steps > 0:
        from mrisr_tpu.models.adapter import T2IAdapter
        from mrisr_tpu.train.latent import make_adapter_train_step

        unsh = res // f
        ad = T2IAdapter(
            channels=(uw, 2 * uw, 2 * uw, 2 * uw), num_res_blocks=3,
            cin=3 * unsh * unsh, unshuffle_factor=unsh, zero_out=True,
        )
        ad0 = ad.init(jax.random.PRNGKey(7), jnp.zeros((1, res, res, 3)))
        astate = create_train_state(ad.apply, ad0, make_optimizer(2e-4))
        astep = make_adapter_train_step(
            unet, ad, vae_s, sched, prompt, empty, prediction_type=prediction_type,
            latents_cached=cache_latents,
        )
        astate = train_loop(
            astate, astep, {"unet": base_params, "vae": vae_params},
            adapter_steps, "adapter", 40_000,
        )
        ad_params = astate.params

    pipe = LatentSRPipeline(
        unet, cn, vae_s, sched, base_params, cn_params0, vae_params, prompt,
        prediction_type=prediction_type,
    )
    pipe_ad = (
        LatentSRPipeline(
            unet, None, vae_s, sched, base_params, ad_params, vae_params, prompt,
            prediction_type=prediction_type, adapter=ad,
        )
        if ad is not None
        else None
    )
    lr_te_dev = jnp.asarray(to_pm1(lr_te))
    n_seeds = len(sample_seeds)

    def sample_rows(unet_p, cn_p, p=None, nsteps=None) -> dict:
        """Per-image metrics over n_test x len(sample_seeds), noise paired
        by (image, seed) across variants (same fold_in key walk)."""
        p = p or pipe
        per_seed = []
        for s in sample_seeds:
            out = p.super_resolve_with(
                unet_p, cn_p, vae_params, prompt, lr_te_dev,
                jax.random.PRNGKey(int(s)),
                nsteps if nsteps is not None else num_inference_steps,
            )
            per_seed.append(_metrics_per_image(gray(to_unit(out)), hr_te))
        flat = {
            m: [v for ps in per_seed for v in ps[m]]
            for m in ("psnr", "ssim", "nmse", "hfen")
        }
        return {"mean": {m: float(np.mean(flat[m])) for m in flat}, "per_image": flat}

    rows = {
        "base_unet": sample_rows(base_params, cn_params0),
        "controlnet": sample_rows(base_params, cstate.params),
        "lora": sample_rows(lora_merged, cn_params0),
    }
    for r, merged in sweep_merged.items():
        rows[f"lora_r{r}"] = sample_rows(merged, cn_params0)
    if cl_params is not None:
        rows["cn_lora"] = sample_rows(
            merge_lora(base_params, cl_params["lora"]), cl_params["cn"]
        )
    if ad_params is not None:
        rows["adapter"] = sample_rows(base_params, ad_params, p=pipe_ad)

    # Paired reference rows: bicubic input, repeated per seed to pair with
    # the (image, seed) sample grid.
    bicubic_flat = _metrics_per_image(lr_te, hr_te)
    bicubic_rep = {
        m: bicubic_flat[m] * len(sample_seeds) for m in bicubic_flat
    }

    def attach_bicubic_delta(row: dict) -> dict:
        psnr_stats = _paired_delta_stats(
            row["per_image"]["psnr"], bicubic_rep["psnr"], n_seeds=n_seeds
        )
        # delta = model - bicubic here (positive = model BETTER); flip the
        # _paired_delta_stats convention (exact - other).  The verdict uses
        # the conservative image-clustered interval (seed replicates of one
        # image are correlated — VERDICT round-4 weak #2).
        row["delta_vs_bicubic_psnr"] = psnr_stats
        gate = psnr_stats.get("clustered_by_image", psnr_stats)
        row["beats_bicubic"] = bool(gate["ci95"][0] > 0.0)
        row["beats_bicubic_flat"] = bool(psnr_stats["ci95"][0] > 0.0)
        return psnr_stats

    for name, row in rows.items():
        psnr_stats = attach_bicubic_delta(row)
        gate = psnr_stats.get("clustered_by_image", psnr_stats)
        print(
            f"[latent row {name}] psnr={row['mean']['psnr']:.3f} "
            f"dpsnr_vs_bicubic={psnr_stats['mean']:+.3f} "
            f"ci95_clustered=({gate['ci95'][0]:+.3f},{gate['ci95'][1]:+.3f})",
            flush=True,
        )

    # Extra chain-length legs (e.g. 50-step for the BASELINE config-2
    # wording; the default 20 follows res_srdiff.py:36).
    extra_rows = ("controlnet", "lora", "cn_lora", "adapter")
    for k in extra_sample_steps:
        k = int(k)
        for name in extra_rows:
            if name not in rows:
                continue
            if name == "controlnet":
                r = sample_rows(base_params, cstate.params, nsteps=k)
            elif name == "lora":
                r = sample_rows(lora_merged, cn_params0, nsteps=k)
            elif name == "cn_lora":
                r = sample_rows(
                    merge_lora(base_params, cl_params["lora"]), cl_params["cn"],
                    nsteps=k,
                )
            else:
                r = sample_rows(base_params, ad_params, p=pipe_ad, nsteps=k)
            attach_bicubic_delta(r)
            rows[name][f"steps_{k}"] = r
            print(
                f"[latent row {name} @{k} steps] psnr={r['mean']['psnr']:.3f} "
                f"beats_bicubic={r['beats_bicubic']}",
                flush=True,
            )

    cn_vs_base = _paired_delta_stats(
        rows["controlnet"]["per_image"]["psnr"],
        rows["base_unet"]["per_image"]["psnr"],
        n_seeds=n_seeds,
    )
    return {
        "reference_entry_point": "src/adapters/res_srdiff.py:36-105",
        "config": {
            "res": res, "n_train": n_train, "n_test": n_test,
            "vae": {**vae_cfg, "f": res // f, "scaling_factor": scaling},
            "unet_channels": [uw, 2 * uw, 2 * uw, 2 * uw],
            "steps": {"vae": vae_steps, "base": base_steps, "cn": cn_steps,
                      "lora": lora_steps, "adapter": adapter_steps,
                      "cn_lora": cn_lora_steps},
            "num_inference_steps": num_inference_steps,
            "extra_sample_steps": [int(s) for s in extra_sample_steps],
            "sample_seeds": [int(s) for s in sample_seeds],
            "lora_rank": lora_rank,
            "lora_ranks": [int(r) for r in lora_ranks],
            "degrade_scale": degrade_scale, "texture_mode": texture_mode,
            "chunk_steps": chunk_steps, "prediction_type": prediction_type,
            "cache_latents": cache_latents, "vae_chunk_steps": vae_chunk_steps,
        },
        "bicubic_baseline": _metrics(lr_te, hr_te),
        "vae_recon_ceiling": vae_ceiling,
        **rows,
        "controlnet_minus_base_psnr": cn_vs_base,
    }


def run_fastmri_cnn(index_json: str, steps: int = 2000, res: int = 256, batch: int = 8) -> dict:
    """Reproduce the reference's CNN-stage evaluation on real FastMRI data
    (cell 29 training + cell 32 eval; anchor in REFERENCE_ANCHORS)."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.data.datasets import FastMRISliceDataset
    from mrisr_tpu.data.loader import Loader
    from mrisr_tpu.models.simple_cnn import SimpleCNN
    from mrisr_tpu.train.state import create_train_state, make_optimizer
    from mrisr_tpu.train.steps import make_cnn_train_step

    key = jax.random.PRNGKey(0)
    train = FastMRISliceDataset(json_path=index_json, mode="train", target_size=(res, res))
    test = FastMRISliceDataset(json_path=index_json, mode="test", target_size=(res, res))
    loader = Loader(train, batch_size=batch, shuffle=True, seed=42)
    cnn = SimpleCNN()
    params = cnn.init(key, jnp.zeros((1, res, res, 1)))
    state = create_train_state(cnn.apply, params, make_optimizer(1e-4))
    step = make_cnn_train_step(cnn)
    i = 0
    while i < steps:
        for b in loader:
            if i >= steps:
                break
            bb = {"lr": jnp.asarray(b["lr"]), "hr": jnp.asarray(b["hr"])}
            state, _ = step(state, bb, jax.random.fold_in(key, i))
            i += 1
    sums, n = None, 0
    apply = jax.jit(cnn.apply)
    for j in range(len(test)):
        s = test[j]
        pred = np.asarray(apply(state.params, jnp.asarray(s["lr"])[None]))
        m = _metrics(pred, np.asarray(s["hr"])[None])
        sums = m if sums is None else {k: sums[k] + m[k] for k in m}
        n += 1
    result = {k: v / n for k, v in sums.items()}
    return {"steps": steps, "n_test": n, "model": result, "anchor": REFERENCE_ANCHORS["fastmri_cnn"]}


def run_parity(
    out_path: str | Path,
    mnist_steps: int = 300,
    phantom_steps: int = 400,
    resdiff_steps: int = 300,
    res: int = 64,
    index_json: str | None = None,
    n_train: int = 64,
    lr_schedule: str = "constant",
    batch: int = 8,
    textured: bool = True,
    degrade_scale: float = 4.0,
    ca_kv_pool: int = 0,
    skip_mnist: bool = False,
    texture_mode: str = "recoverable",
    eval_every: int = 0,
    ckpt_path: str | None = None,
    resume_ckpt: str | None = None,
    inner_channel: int = 16,
    ema_decay: float = 0.99,
    n_test: int = 16,
    sample_seeds: tuple = (2,),
    chunk_steps: int = 0,
    sample_steps: tuple = (10, 50, 250, 1000),
) -> dict:
    t0 = time.time()
    report: dict = {"anchors": REFERENCE_ANCHORS}
    if not skip_mnist:
        report["mnist_regression"] = run_mnist(mnist_steps)
    cnn_res = run_phantom_cnn(
        phantom_steps, res, batch=batch, n_train=n_train,
        textured=textured, degrade_scale=degrade_scale, texture_mode=texture_mode,
    )
    report["phantom_cnn"] = {k: v for k, v in cnn_res.items() if k != "cnn_params"}
    print(
        f"[parity] stage-1 CNN: psnr={cnn_res['model']['psnr']:.2f} "
        f"ssim={cnn_res['model']['ssim']:.4f} | bicubic "
        f"psnr={cnn_res['bicubic_baseline']['psnr']:.2f}",
        flush=True,
    )
    report["phantom_resdiff"] = run_phantom_resdiff(
        cnn_res, resdiff_steps, res, batch=batch, n_train=n_train,
        lr_schedule=lr_schedule, textured=textured, degrade_scale=degrade_scale,
        ca_kv_pool=ca_kv_pool, texture_mode=texture_mode, eval_every=eval_every,
        ckpt_path=ckpt_path, resume_ckpt=resume_ckpt,
        inner_channel=inner_channel, ema_decay=ema_decay,
        n_test=n_test, sample_seeds=sample_seeds, chunk_steps=chunk_steps,
        sample_steps=sample_steps,
    )
    report["config"] = {
        "n_train": n_train, "lr_schedule": lr_schedule, "res": res, "batch": batch,
        "textured": textured, "degrade_scale": degrade_scale,
        "ca_kv_pool": ca_kv_pool, "texture_mode": texture_mode,
        "inner_channel": inner_channel, "ema_decay": ema_decay,
        "n_test": n_test, "sample_seeds": [int(s) for s in sample_seeds],
        "chunk_steps": chunk_steps,
    }
    if index_json:
        report["fastmri_cnn"] = run_fastmri_cnn(index_json)
    report["elapsed_sec"] = round(time.time() - t0, 1)
    Path(out_path).write_text(json.dumps(report, indent=2))
    return report
