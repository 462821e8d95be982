"""Grayscale ResDiff UNet — the flagship Stage-2 denoiser, rebuilt natively.

The reference's actual denoiser lives in the runtime-cloned LYL1015/ResDiff
repo, grayscale-specialised by notebook monkey-patches (SURVEY.md §1
"vendored-at-runtime dependency"; forward semantics re-derived from
``ResDif_execution.ipynb`` cells 8-9 and the config at cell 37):

* Input: ``concat([cnn_sr, x_t])`` on channels (2ch) + continuous noise
  level gamma.  The two halves are split internally (cell 9 / cell 8).
* ``FDInfoSpliter`` expands to 5 channels:
  ``[x_t, cnn_sr, denoise_x, x_lf_feature, x_hf_feature]`` via a learned
  noise-suppression SE path and an FFT Gaussian split with learned sigma
  (cell 8 ``FD_Info_Spliter_New``).
* SR3 backbone: inner=32, mults (1,2,4,4), 1 res-block/level, attn_res {8},
  GroupNorm(16), dropout 0.2 (cell 37 "unet" block).  With 256^2 inputs and
  three downsamples the resolutions are 256/128/64/32, so the self-attention
  at res 8 never fires — only the mid block carries self-attention, exactly
  as in the reference configuration.
* Haar DWT band-pass sums of the CNN image at levels 1..3 feed HF-guided
  cross-attention on each post-downsample skip connection (cell 9: the CA
  output goes into the *skip*, while the trunk continues unchanged).

TPU-native departures: NHWC layout, cross-attention runs q-chunked /
flash-style instead of materialising the (HW)^2 einsum, and the whole module
is shape-static for ``jit``/``lax.scan``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mrisr_tpu.models.layers import (
    Downsample,
    HFGuidedCrossAttention,
    NoiseLevelMLP,
    ResnetBlockWithAttn,
    SEBlock,
    SpaceConv,
    Upsample,
    ConvBlock,
)
from mrisr_tpu.ops.fourier import gaussian_highpass_split
from mrisr_tpu.ops.space_to_depth import concat_s2d, depth_to_space, space_to_depth
from mrisr_tpu.ops.wavelets import haar_dwt_highpass_sum


class FDInfoSpliter(nn.Module):
    """Frequency-domain information splitter (cell 8 semantics, NHWC).

    Input ``[B, H, W, 2]`` = concat(cnn_sr, x_t); emits ``[B, H, W, 5]``.

    The FFT branch (``x_lf``/``x_hf``) depends only on the Stage-1 CNN
    estimate, which is constant across all steps of a sampling chain; XLA
    does not hoist work out of ``lax.scan`` bodies, so callers should
    precompute it once via :meth:`static_features` and pass it through
    ``static=`` (the sampler fast path).  Omitting ``static`` recomputes it
    inline (the training path, where every batch is fresh).
    """

    emb_dim: int
    image_size: int
    reduction: int = 2

    def setup(self):
        self.noise_func = nn.Dense(self.image_size)
        self.noise_resSE = SEBlock(self.reduction)
        self.sigma_resSE = SEBlock(self.reduction)
        self.HF_guided_resSE = SEBlock(self.reduction)
        self.channel_transform = nn.Conv(1, (1, 1))

    def static_features(self, cnn_x: jnp.ndarray):
        """``cnn_x`` [B, H, W, 1] -> (x_lf, x_hf), each [B, H, W, 1]."""
        # FFT of the CNN estimate (2D over H, W; see ops/fourier.py notes).
        xf = jnp.fft.fft2(cnn_x[..., 0].astype(jnp.float32))  # [B, H, W] complex
        x_fd = jnp.stack([xf.real, xf.imag], axis=-1)  # [B, H, W, 2]

        # Learned sigma: |mean over channels of SE-pooled map| + size/2,
        # clamped to size-10 (cell 8 numerical stabilisation).
        se_fd = self.sigma_resSE(x_fd)
        pooled = jnp.mean(se_fd, axis=(1, 2))  # [B, 2]
        sigma_pre = jnp.abs(jnp.mean(pooled, axis=-1)) + self.image_size / 2.0  # [B]
        sigma = jnp.minimum(sigma_pre, float(self.image_size - 10))

        xf_filtered, hf_abs = gaussian_highpass_split(
            cnn_x.transpose(0, 3, 1, 2), sigma[:, None]
        )  # NCHW helpers
        x_fd_filtered = jnp.stack(
            [xf_filtered[:, 0].real, xf_filtered[:, 0].imag], axis=-1
        )  # [B, H, W, 2]
        hf_guided = self.HF_guided_resSE(x_fd_filtered)
        atten = self.channel_transform(hf_guided)
        x_lf = (cnn_x * atten).astype(cnn_x.dtype)
        x_hf = hf_abs.transpose(0, 2, 3, 1).astype(cnn_x.dtype)  # [B, H, W, 1]
        return x_lf, x_hf

    def __call__(
        self, x: jnp.ndarray, noise_emb: jnp.ndarray, static=None, io_s2d: bool = False
    ) -> jnp.ndarray:
        if io_s2d:
            return self._call_s2d(x, noise_emb, static)
        cnn_x = x[..., 0:1]
        xt = x[..., 1:2]
        b, h, w, _ = x.shape

        # Noise-image suppression: embed -> one row, broadcast down H.
        row = self.noise_func(noise_emb)  # [B, W]
        noise_img = jnp.broadcast_to(row[:, None, :, None], (b, h, self.image_size, 1))
        noise_atten = self.noise_resSE(noise_img)
        denoise_x = xt * noise_atten

        x_lf, x_hf = self.static_features(cnn_x) if static is None else static
        return jnp.concatenate([xt, cnn_x, denoise_x, x_lf, x_hf], axis=-1)

    def _call_s2d(self, x, noise_emb, static):
        """Space-to-depth variant of the per-step branch (sampler fast path).

        ``x`` is ``s2d(concat([cnn_sr, x_t]))`` — ``[B, H/2, W/2, 8]`` with
        c-major channel order ``{0: cnn, 1: x_t}*4 + (u*2+v)``; ``static``
        must hold
        the chain-invariant ``(x_lf, x_hf)`` already in s2d form.  Every op
        below acts on the same pixel values as the plain branch, so results
        are exact up to float rounding.
        """
        assert static is not None, "io_s2d requires precomputed static features"
        cnn_x = x[..., 0:4]  # s2d C=4 of the 1-channel map (c-major order)
        xt = x[..., 4:8]
        b, h2, w2, _ = x.shape

        # noise_img[b, 2i+u, 2j+v, 0] = row[b, 2j+v] -> s2d channel (u*2+v).
        row = self.noise_func(noise_emb)  # [B, W]
        rr = row.reshape(b, 1, self.image_size // 2, 1, 2)
        noise_img = jnp.broadcast_to(rr, (b, h2, w2, 2, 2)).reshape(b, h2, w2, 4)
        noise_atten = self.noise_resSE(noise_img, s2d=True)
        denoise_x = xt * noise_atten

        x_lf, x_hf = static
        return concat_s2d(xt, cnn_x, denoise_x, x_lf, x_hf)


class ResDiffUNet(nn.Module):
    """SR3 backbone + FD splitter + DWT-guided skip cross-attention.

    Samplers should call :meth:`compute_static` once per chain (on the
    Stage-1 CNN estimate) and pass the result as ``static=`` on every step:
    the FFT frequency split and the Haar DWT query pyramid depend only on
    ``cnn_sr`` and would otherwise be recomputed inside every ``lax.scan``
    iteration (XLA does not hoist across scan bodies).
    """

    image_size: int = 256
    inner_channel: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 4)
    res_blocks: int = 1
    attn_res: Sequence[int] = (8,)
    norm_groups: int = 16
    dropout: float = 0.2
    out_channels: int = 1
    # Run the full-resolution (level-0) stage on space-to-depth tensors:
    # at C=32 the NHWC lane layout leaves convs 4x under-packed (10.9 vs
    # 140+ TFLOP/s measured on v5e — PERF.md round 3); the s2d rewrite is
    # mathematically exact and uses the SAME parameter tree, so it is on by
    # default and disabled automatically when shapes don't allow it.
    s2d_level0: bool = True
    # How many UNet levels (from the top) execute on s2d tensors when
    # s2d_level0 is set.  Level 0 is the big win (C=32, 4x under-packed).
    # Level 1 (s2d_depth=2) measured NET NEGATIVE on v5e (round 4: 16.6 ->
    # 18.5 ms/step): at C=64 the plain convs are only 2x under-packed, and
    # the per-step d2s/s2d hops (CA site, upsample) outweigh the conv win.
    # Levels with attention or odd dims fall back automatically; contiguity
    # from level 0 is enforced.
    s2d_depth: int = 1
    # Run the HF-guided cross-attention GN + 1x1 projections on s2d tensors
    # at the lane-under-packed sites (C < 128, even dims) — exact rewrite,
    # same param tree (layers.HFGuidedCrossAttention._call_s2d).  Measured
    # NET NEGATIVE on v5e (round 4: 16.4 -> 16.9 ms/step): the s2d->token
    # relayout feeding the attention kernel costs more than the packed
    # projections save.  OFF by default; kept for future lane-layout work.
    ca_s2d: bool = False
    # FAST SERVING PROFILE (opt-in; 0/1 = exact reference semantics).  K/V
    # spatial average-pooling factor at the HF-CA sites with >= 4096 tokens
    # — the (HW)^2 attention whose exps/MXU passes dominate the step
    # (PERF.md).  kv_pool^2 fewer score columns; queries and output length
    # unchanged; SAME param tree as the exact model, so one checkpoint
    # serves both profiles.  Fidelity validated head-to-head through the
    # parity harness — see PARITY fast-profile evidence + PERF.md round 5.
    ca_kv_pool: int = 0
    # Minimum token count (now_res^2) for a CA site to pool its K/V.  The
    # default 4096 pools both the 16384-token res-128 site and the
    # 4096-token res-64 site at 256^2 inputs.  Raising it to 8192 yields
    # the SITE-SELECTIVE middle profile (VERDICT round-2 item 4): only the
    # dominant 16384-token site pools (~7.4 of 14.7 ms/step — PERF.md
    # round-5 decomposition) while the smaller site stays exact — a
    # strictly smaller semantic deviation at nearly the fast profile's
    # throughput.  Ignored when ca_kv_pool in {0, 1} (exact).
    ca_kv_pool_min_tokens: int = 4096
    # INT8 SERVING PROFILE (opt-in; False = exact reference semantics).
    # Runs the interior ResnetBlock 3x3 convs in dynamic int8 on the MXU
    # (2x the bf16 rate on v5e) — per-tensor activation scale +
    # per-out-channel kernel scales, quantized at apply time (ops/quant.py),
    # SAME param tree, so one checkpoint serves all profiles.  conv_in, the
    # final ConvBlock, 1x1 shortcuts, and the resample convs stay exact
    # (output-adjacent or too small to matter).  Composes with ca_kv_pool.
    # Fidelity goes through the parity harness like every serving profile.
    conv_int8: bool = False

    def setup(self):
        self.fd_spliter = FDInfoSpliter(self.inner_channel, self.image_size)

    def s2d_eligible(self, H: int, W: int) -> bool:
        """Whether the level-0 stage runs on s2d tensors at resolution H x W.

        Single source of truth for the gate — ``__call__`` and the sampler
        pipeline's ``io_s2d`` fast path (pipelines/resdiff.py) both use it,
        so they can never drift apart.  Requires ``s2d_depth >= 1``:
        ``s2d_level0`` only says the rewrite is allowed, ``s2d_depth`` says
        how many levels actually use it (ADVICE round-1: without this,
        s2d_level0=True + s2d_depth=0 made conv_in emit an s2d tensor that
        the plain level-0 blocks then mis-normalised).
        """
        return (
            self.s2d_level0
            and self.s2d_depth >= 1
            and len(self.channel_mults) >= 2
            and H % 2 == 0
            and W % 2 == 0
            and H not in self.attn_res
        )

    def _dwt_queries(self, cnn_x: jnp.ndarray):
        n_down = len(self.channel_mults) - 1
        qs = haar_dwt_highpass_sum(
            cnn_x.transpose(0, 3, 1, 2), n_down
        )  # list of [B, 1, h, w], NCHW from the op
        return tuple(q.transpose(0, 2, 3, 1) for q in qs)

    def compute_static(self, cnn_x: jnp.ndarray):
        """Chain-invariant features of the CNN estimate ``[B, H, W, 1]``.

        Returns ``((x_lf, x_hf), dwt_queries)`` for the ``static=`` argument
        of ``__call__``.  Use via
        ``unet.apply(params, cnn_sr, method="compute_static")``.
        """
        return self.fd_spliter.static_features(cnn_x), self._dwt_queries(cnn_x)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        gamma: jnp.ndarray,
        deterministic: bool = True,
        static=None,
        io_s2d: bool = False,
    ) -> jnp.ndarray:
        """``x``: [B, H, W, 2] = concat(cnn_sr, x_t) on channels; ``gamma``: [B].

        ``io_s2d=True`` (the sampler fast path) moves the model's I/O into
        space-to-depth form: ``x`` is ``s2d(concat([cnn_sr, x_t]))`` of shape
        [B, H/2, W/2, 8], ``static`` is required with its FD features already
        in s2d form, and the returned eps is s2d [B, H/2, W/2, 4] — the whole
        sampling chain then never touches a C=1 full-resolution tensor.
        """
        n_levels = len(self.channel_mults)
        if io_s2d:
            H, W = x.shape[1] * 2, x.shape[2] * 2
        else:
            H, W = x.shape[1], x.shape[2]
        # Level-0 runs on space-to-depth tensors when shapes allow (exact
        # rewrite, same params — see the class docstring / PERF.md round 3).
        s2d_on = self.s2d_eligible(H, W)
        if io_s2d:
            assert s2d_on and static is not None, (
                "io_s2d requires s2d_level0-compatible shapes and precomputed static"
            )

        # Per-level s2d flags (contiguous from level 0; a level needs even
        # dims at its resolution, no attention, and must not be the last).
        lvl_s2d_flags = []
        ok = s2d_on
        for L in range(n_levels):
            res_h, res_w = H >> L, W >> L
            ok = (
                ok
                and L < self.s2d_depth
                and L < n_levels - 1
                and res_h % 2 == 0
                and res_w % 2 == 0
                and res_h not in self.attn_res
            )
            lvl_s2d_flags.append(ok)

        if static is None:
            cnn_x = x[..., 0:1]
            fd_static, dwt_queries = None, self._dwt_queries(cnn_x)
        else:
            fd_static, dwt_queries = static

        # The noise-level encoding computes in fp32 (sin/cos precision);
        # cast to the activation dtype so a bf16 forward stays bf16 —
        # otherwise the fp32 emb promotes every downstream op to fp32.
        emb = NoiseLevelMLP(self.inner_channel)(gamma).astype(x.dtype)

        h = self.fd_spliter(x, emb, static=fd_static, io_s2d=io_s2d)
        if s2d_on:
            if not io_s2d:
                h = space_to_depth(h)
            h = SpaceConv(self.inner_channel, 3, name="conv_in")(h)
        else:
            h = nn.Conv(self.inner_channel, (3, 3), padding="SAME", name="conv_in")(h)

        feats = [h]  # level-0 entries live in s2d space when s2d_on
        now_res = H
        pre = self.inner_channel
        for i, mult in enumerate(self.channel_mults):
            ch = self.inner_channel * mult
            use_attn = now_res in self.attn_res
            lvl_s2d = lvl_s2d_flags[i]
            for _ in range(self.res_blocks):
                h = ResnetBlockWithAttn(
                    ch, self.norm_groups, self.dropout, use_attn, s2d=lvl_s2d,
                    int8=self.conv_int8,
                )(h, emb, deterministic)
                feats.append(h)
            pre = ch
            if i != n_levels - 1:
                # The downsample stays in s2d space when the next level also
                # runs s2d; otherwise it EXITS to normal space.
                next_s2d = lvl_s2d_flags[i + 1]
                h = Downsample(
                    pre,
                    s2d_exit=lvl_s2d and not next_s2d,
                    s2d_io=lvl_s2d and next_s2d,
                )(h)
                now_res //= 2
                # Skip connection is the CA-modulated map; trunk continues as h.
                ca_s2d = self.ca_s2d and pre < 128 and now_res % 2 == 0
                kvp = (
                    self.ca_kv_pool
                    if now_res * now_res >= self.ca_kv_pool_min_tokens
                    else 0
                )
                ca = HFGuidedCrossAttention(self.norm_groups)(
                    h, dwt_queries[i], s2d=ca_s2d, io_s2d=next_s2d, kv_pool=kvp
                )
                feats.append(ca)

        h = ResnetBlockWithAttn(
            pre, self.norm_groups, self.dropout, True, int8=self.conv_int8
        )(h, emb, deterministic)
        h = ResnetBlockWithAttn(
            pre, self.norm_groups, self.dropout, False, int8=self.conv_int8
        )(h, emb, deterministic)

        for i, mult in enumerate(reversed(self.channel_mults)):
            ch = self.inner_channel * mult
            use_attn = now_res in self.attn_res
            L = n_levels - 1 - i  # UNet level of this up stage
            lvl_s2d = lvl_s2d_flags[L]
            for _ in range(self.res_blocks + 1):
                skip = feats.pop()
                if lvl_s2d:
                    h = concat_s2d(h, skip)  # order-preserving s2d concat
                else:
                    h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlockWithAttn(
                    ch, self.norm_groups, self.dropout, use_attn, s2d=lvl_s2d,
                    int8=self.conv_int8,
                )(h, emb, deterministic)
            if i != n_levels - 1:
                # The upsample re-ENTERS s2d space for free from a plain
                # input (s2d of a nearest-x2 upsample is a channel tile);
                # from an s2d input it stays s2d via one d2s + tile.
                dest_s2d = lvl_s2d_flags[L - 1]
                h = Upsample(
                    ch,
                    s2d_entry=dest_s2d and not lvl_s2d,
                    s2d_io=dest_s2d and lvl_s2d,
                )(h)
                now_res *= 2

        h = ConvBlock(self.out_channels, self.norm_groups, name="final_conv", s2d=s2d_on)(h)
        if s2d_on and not io_s2d:
            h = depth_to_space(h)
        return h
