"""Executable torch<->JAX differential test for the flagship ResDiff denoiser.

The grayscale-patched reference modules (``ResDif_execution.ipynb`` cells
8-9: ``ResSE_Fixed``, ``FD_Info_Spliter_New``, ``HF_guided_CA_New``,
``patched_unet_forward``) are re-typed here in torch 2.13 verbatim.  The SR3
backbone around them lives in the runtime-cloned ``LYL1015/ResDiff``
``model/resdiff_modules/unet.py``, which is NOT in the mirror — it is
re-typed from the public SR3 architecture exactly as SURVEY.md §2 documents
it (Block = GN->Swish->Dropout->Conv3x3, FeatureWiseAffine additive noise
injection, 1-head 1/sqrt(C) self-attention, stride-2 3x3 Downsample,
nearest+3x3 Upsample, skip-per-block bookkeeping incl. the downsample skip).

``pytorch_wavelets`` is absent from the image; ``DWTForward(J, 'haar',
'symmetric')`` is re-typed as the literal stride-2 correlation filter bank:
for even input dims ``pywt.dwt_coeff_len`` gives outsize N/2 and therefore
zero padding, so the 2x2 block transform is the exact same computation.

Weights flow flax -> torch via a structural walk (HWIO->OIHW transposes,
Dense transposes), then forward agreement is asserted in fp32 at 64^2 —
component-by-component AND full-forward, with the space-to-depth execution
paths checked against the same torch twin.  This is the test VERDICT.md
round-1 item 3 asked for; it caught the GroupNorm eps mismatch
(torch 1e-5 vs flax default 1e-6 — now pinned via ``layers.GN_EPS``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from mrisr_tpu.models.layers import NoiseLevelMLP, SEBlock, HFGuidedCrossAttention
from mrisr_tpu.models.resdiff_unet import FDInfoSpliter, ResDiffUNet
from mrisr_tpu.ops.wavelets import haar_dwt_highpass_sum

# ---------------------------------------------------------------------------
# Reference modules, re-typed from ResDif_execution.ipynb cell 8 (verbatim
# math; `indexing="ij"` is torch<2 meshgrid's default, spelled explicitly).
# ---------------------------------------------------------------------------


class ResSEFixed(tnn.Module):
    def __init__(self, ch_in, reduction=2):
        super().__init__()
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        bottleneck_ch = max(1, ch_in // reduction)
        self.fc = tnn.Sequential(
            tnn.Linear(ch_in, bottleneck_ch, bias=False),
            tnn.ReLU(inplace=True),
            tnn.Linear(bottleneck_ch, ch_in, bias=False),
            tnn.Sigmoid(),
        )

    def forward(self, x):
        tmp = x
        b, c, _, _ = x.size()
        y = self.avg_pool(x).view(b, c)
        y = self.fc(y).view(b, c, 1, 1)
        return x * y.expand_as(x) + tmp


class FDInfoSpliterTorch(tnn.Module):
    """Cell 8 ``FD_Info_Spliter_New`` (grayscale: in_channels forced to 1)."""

    def __init__(self, dim, image_size):
        super().__init__()
        in_channels = 1
        self.image_size = image_size
        self.noise_func = tnn.Linear(dim, image_size)
        self.noise_resSE = ResSEFixed(in_channels)
        self.sigma_resSE = ResSEFixed(in_channels * 2)
        self.avg_pool = tnn.AdaptiveAvgPool2d(1)
        self.HF_guided_resSE = ResSEFixed(in_channels * 2)
        self.channel_transform = tnn.Conv2d(2 * in_channels, in_channels, 1)

    def forward(self, x, noise_embed):
        cnn_x, x = torch.split(x, x.shape[1] // 2, dim=1)
        b, c, h, w = x.shape
        noise_embed = self.noise_func(noise_embed.view(b, -1))
        noise_embed = noise_embed.unsqueeze(1).unsqueeze(2).repeat(1, 1, self.image_size, 1)
        noise_atten = self.noise_resSE(noise_embed)
        denoise_x = x * noise_atten

        n, m = x.shape[-2:]
        xx = torch.arange(n, dtype=torch.float)
        yy = torch.arange(m, dtype=torch.float)
        u, v = torch.meshgrid(xx, yy, indexing="ij")
        u = u - n / 2
        v = v - m / 2

        tensor_complex = torch.view_as_complex(
            torch.stack([cnn_x, torch.zeros_like(cnn_x)], dim=-1)
        )
        # Reference quirk: fftn over ALL dims of [B, 1, H, W] — equals a 2D
        # FFT only at B=1 (the reference's batch size; ops/fourier.py:11-14).
        tensor_fft = torch.fft.fftn(tensor_complex)
        x_fd = torch.cat([torch.real(tensor_fft), torch.imag(tensor_fft)], dim=1)

        sigma_pre = (
            torch.abs(torch.mean(self.avg_pool(self.sigma_resSE(x_fd)), dim=1))
            + self.image_size / 2
        )
        sigma_min = (
            torch.tensor(float(self.image_size - 10)).view(1, 1, 1).expand_as(sigma_pre)
        )
        sigma = torch.minimum(sigma_pre, sigma_min)

        D = torch.sqrt(u**2 + v**2)
        H = 1 - torch.exp(-(D**2) / (2 * sigma**2))
        H = H.unsqueeze(1)
        tensor_filtered_fft = tensor_fft * H
        x_fd_filterd = torch.cat(
            [torch.real(tensor_filtered_fft), torch.imag(tensor_filtered_fft)], dim=1
        )
        x_hf_guided_atten = self.HF_guided_resSE(x_fd_filterd)
        x_lf_feature = cnn_x * self.channel_transform(x_hf_guided_atten)
        tensor_filtered = torch.fft.ifftn(tensor_filtered_fft)
        x_hf_feature = torch.abs(tensor_filtered)
        return torch.cat([x, cnn_x, denoise_x, x_lf_feature, x_hf_feature], dim=1)


class HFGuidedCATorch(tnn.Module):
    """Cell 8 ``HF_guided_CA_New`` (full (HW)^2 einsum attention)."""

    def __init__(self, in_channel, norm_groups=32):
        super().__init__()
        self.norm = tnn.GroupNorm(norm_groups, in_channel)
        self.q = tnn.Conv2d(1, in_channel, 1, bias=False)
        self.kv = tnn.Conv2d(in_channel, in_channel * 2, 1, bias=False)
        self.out = tnn.Conv2d(in_channel, in_channel, 1)

    def forward(self, input, quary):
        batch, channel, height, width = input.shape
        norm = self.norm(input)
        kv = self.kv(norm).view(batch, 1, channel * 2, height, width)
        key, value = kv.chunk(2, dim=2)
        quary = self.q(quary).unsqueeze(1)
        attn = (
            torch.einsum("bnchw, bncyx -> bnhwyx", quary, key).contiguous()
            / math.sqrt(channel)
        )
        attn = torch.softmax(attn.view(batch, 1, height, width, -1), -1).view(
            batch, 1, height, width, height, width
        )
        out = torch.einsum("bnhwyx, bncyx -> bnchw", attn, value).contiguous()
        return self.out(out.view(batch, channel, height, width)) + input


# ---------------------------------------------------------------------------
# SR3 backbone, re-typed per SURVEY.md §2 (upstream unet.py not in mirror)
# ---------------------------------------------------------------------------


class Swish(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class PositionalEncoding(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, noise_level):
        count = self.dim // 2
        step = torch.arange(count, dtype=noise_level.dtype) / count
        enc = noise_level.unsqueeze(1) * torch.exp(-math.log(1e4) * step.unsqueeze(0))
        return torch.cat([torch.sin(enc), torch.cos(enc)], dim=-1)


class FeatureWiseAffine(tnn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.noise_func = tnn.Sequential(tnn.Linear(in_channels, out_channels))

    def forward(self, x, noise_embed):
        return x + self.noise_func(noise_embed).view(x.shape[0], -1, 1, 1)


class Block(tnn.Module):
    def __init__(self, dim, dim_out, groups=32, dropout=0):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.GroupNorm(groups, dim),
            Swish(),
            tnn.Dropout(dropout) if dropout != 0 else tnn.Identity(),
            tnn.Conv2d(dim, dim_out, 3, padding=1),
        )

    def forward(self, x):
        return self.block(x)


class ResnetBlockTorch(tnn.Module):
    def __init__(self, dim, dim_out, noise_level_emb_dim=None, dropout=0, norm_groups=32):
        super().__init__()
        self.noise_func = FeatureWiseAffine(noise_level_emb_dim, dim_out)
        self.block1 = Block(dim, dim_out, groups=norm_groups)
        self.block2 = Block(dim_out, dim_out, groups=norm_groups, dropout=dropout)
        self.res_conv = (
            tnn.Conv2d(dim, dim_out, 1) if dim != dim_out else tnn.Identity()
        )

    def forward(self, x, time_emb):
        h = self.block1(x)
        h = self.noise_func(h, time_emb)
        h = self.block2(h)
        return h + self.res_conv(x)


class SelfAttentionTorch(tnn.Module):
    def __init__(self, in_channel, n_head=1, norm_groups=32):
        super().__init__()
        self.n_head = n_head
        self.norm = tnn.GroupNorm(norm_groups, in_channel)
        self.qkv = tnn.Conv2d(in_channel, in_channel * 3, 1, bias=False)
        self.out = tnn.Conv2d(in_channel, in_channel, 1)

    def forward(self, input):
        batch, channel, height, width = input.shape
        head_dim = channel // self.n_head
        norm = self.norm(input)
        qkv = self.qkv(norm).view(batch, self.n_head, head_dim * 3, height, width)
        query, key, value = qkv.chunk(3, dim=2)
        attn = (
            torch.einsum("bnchw, bncyx -> bnhwyx", query, key).contiguous()
            / math.sqrt(channel)
        )
        attn = attn.view(batch, self.n_head, height, width, -1)
        attn = torch.softmax(attn, -1)
        attn = attn.view(batch, self.n_head, height, width, height, width)
        out = torch.einsum("bnhwyx, bncyx -> bnchw", attn, value).contiguous()
        return self.out(out.view(batch, channel, height, width)) + input


class ResnetBlocWithAttnTorch(tnn.Module):
    def __init__(
        self, dim, dim_out, *, noise_level_emb_dim=None, norm_groups=32, dropout=0,
        with_attn=False,
    ):
        super().__init__()
        self.with_attn = with_attn
        self.res_block = ResnetBlockTorch(
            dim, dim_out, noise_level_emb_dim, dropout, norm_groups
        )
        if with_attn:
            self.attn = SelfAttentionTorch(dim_out, norm_groups=norm_groups)

    def forward(self, x, time_emb):
        x = self.res_block(x, time_emb)
        if self.with_attn:
            x = self.attn(x)
        return x


class DownsampleTorch(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = tnn.Conv2d(dim, dim, 3, 2, 1)

    def forward(self, x):
        return self.conv(x)


class UpsampleTorch(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.up = tnn.Upsample(scale_factor=2, mode="nearest")
        self.conv = tnn.Conv2d(dim, dim, 3, padding=1)

    def forward(self, x):
        return self.conv(self.up(x))


def dwt_queries_torch(x, levels):
    """pytorch_wavelets ``DWTForward(J, 'haar', 'symmetric')`` band sums.

    Literal analysis filter bank: correlation with the time-reversed pywt
    haar filters at stride 2.  For even dims ``dwt_coeff_len(N, 2, sym)`` =
    N/2, so the pad amount p = 2*(out-1) - N + L = 0 and the conv below IS
    the exact pytorch_wavelets computation (cell 9 consumes the sum of the
    three band-pass sub-bands per level).
    """
    w = x.new_tensor(
        [
            [[0.5, -0.5], [0.5, -0.5]],  # detail along W
            [[0.5, 0.5], [-0.5, -0.5]],  # detail along H
            [[0.5, -0.5], [-0.5, 0.5]],  # diagonal
            [[0.5, 0.5], [0.5, 0.5]],  # approximation (carried to next level)
        ]
    ).unsqueeze(1)
    out = []
    cur = x
    for _ in range(levels):
        y = tF.conv2d(cur, w, stride=2)
        out.append(y[:, 0:1] + y[:, 1:2] + y[:, 2:3])
        cur = y[:, 3:4]
    return out


class ResDiffUNetTorch(tnn.Module):
    """SR3 backbone + the cell 8/9 patches, with the cell 9 forward."""

    def __init__(
        self,
        image_size=64,
        inner_channel=32,
        channel_mults=(1, 2, 4, 4),
        res_blocks=1,
        attn_res=(8,),
        norm_groups=16,
        dropout=0.0,
        in_channel=5,
        out_channel=1,
    ):
        super().__init__()
        self.J = len(channel_mults) - 1
        noise_level_channel = inner_channel
        self.noise_level_mlp = tnn.Sequential(
            PositionalEncoding(inner_channel),
            tnn.Linear(inner_channel, inner_channel * 4),
            Swish(),
            tnn.Linear(inner_channel * 4, inner_channel),
        )
        self.fd_spliter = FDInfoSpliterTorch(inner_channel, image_size)

        num_mults = len(channel_mults)
        pre_channel = inner_channel
        feat_channels = [pre_channel]
        now_res = image_size
        downs = [tnn.Conv2d(in_channel, inner_channel, 3, padding=1)]
        hf_ca = []
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in attn_res
            channel_mult = inner_channel * channel_mults[ind]
            for _ in range(res_blocks):
                downs.append(
                    ResnetBlocWithAttnTorch(
                        pre_channel, channel_mult,
                        noise_level_emb_dim=noise_level_channel,
                        norm_groups=norm_groups, dropout=dropout, with_attn=use_attn,
                    )
                )
                feat_channels.append(channel_mult)
                pre_channel = channel_mult
            if not is_last:
                downs.append(DownsampleTorch(pre_channel))
                feat_channels.append(pre_channel)
                now_res //= 2
                hf_ca.append(HFGuidedCATorch(pre_channel, norm_groups=norm_groups))
        self.downs = tnn.ModuleList(downs)
        self.hf_ca_list = tnn.ModuleList(hf_ca)

        self.mid = tnn.ModuleList(
            [
                ResnetBlocWithAttnTorch(
                    pre_channel, pre_channel, noise_level_emb_dim=noise_level_channel,
                    norm_groups=norm_groups, dropout=dropout, with_attn=True,
                ),
                ResnetBlocWithAttnTorch(
                    pre_channel, pre_channel, noise_level_emb_dim=noise_level_channel,
                    norm_groups=norm_groups, dropout=dropout, with_attn=False,
                ),
            ]
        )

        ups = []
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in attn_res
            channel_mult = inner_channel * channel_mults[ind]
            for _ in range(res_blocks + 1):
                ups.append(
                    ResnetBlocWithAttnTorch(
                        pre_channel + feat_channels.pop(), channel_mult,
                        noise_level_emb_dim=noise_level_channel,
                        norm_groups=norm_groups, dropout=dropout, with_attn=use_attn,
                    )
                )
                pre_channel = channel_mult
            if not is_last:
                ups.append(UpsampleTorch(pre_channel))
                now_res *= 2
        self.ups = tnn.ModuleList(ups)
        self.final_conv = Block(pre_channel, out_channel, groups=norm_groups)

    def forward(self, x, time):
        # cell 9 ``patched_unet_forward``, verbatim control flow
        dwt_x, _ = torch.split(x, x.shape[1] // 2, dim=1)
        dwt_img_list = dwt_queries_torch(dwt_x, self.J)

        t = self.noise_level_mlp(time)
        x = self.fd_spliter(x, t)

        feats = []
        idx = 0
        for layer in self.downs:
            if isinstance(layer, ResnetBlocWithAttnTorch):
                x = layer(x, t)
            else:
                x = layer(x)
            if len(feats) != 0 and feats[-1].shape[2:] != x.shape[2:]:
                hf_ca = self.hf_ca_list[idx]
                idx += 1
                query = dwt_img_list.pop(0)
                feats.append(hf_ca(x, query))
            else:
                feats.append(x)

        for layer in self.mid:
            x = layer(x, t) if isinstance(layer, ResnetBlocWithAttnTorch) else layer(x)

        for layer in self.ups:
            if isinstance(layer, ResnetBlocWithAttnTorch):
                x = layer(torch.cat((x, feats.pop()), dim=1), t)
            else:
                x = layer(x)

        return self.final_conv(x)


# ---------------------------------------------------------------------------
# flax -> torch weight transfer (structural walk)
# ---------------------------------------------------------------------------


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def load_conv(tconv, fl):
    with torch.no_grad():
        tconv.weight.copy_(_t(fl["kernel"]).permute(3, 2, 0, 1))
        if "bias" in fl and tconv.bias is not None:
            tconv.bias.copy_(_t(fl["bias"]))


def load_linear(tlin, fl):
    with torch.no_grad():
        tlin.weight.copy_(_t(fl["kernel"]).T)
        if "bias" in fl and tlin.bias is not None:
            tlin.bias.copy_(_t(fl["bias"]))


def load_gn(tgn, fl):
    with torch.no_grad():
        tgn.weight.copy_(_t(fl["scale"]))
        tgn.bias.copy_(_t(fl["bias"]))


def load_se(tse, fl):
    load_linear(tse.fc[0], fl["Dense_0"])
    load_linear(tse.fc[2], fl["Dense_1"])


def load_fd(tfd, fl):
    load_linear(tfd.noise_func, fl["noise_func"])
    load_se(tfd.noise_resSE, fl["noise_resSE"])
    load_se(tfd.sigma_resSE, fl["sigma_resSE"])
    load_se(tfd.HF_guided_resSE, fl["HF_guided_resSE"])
    load_conv(tfd.channel_transform, fl["channel_transform"])


def load_ca(tca, fl):
    load_gn(tca.norm, fl["GroupNorm_0"])
    load_conv(tca.kv, fl["Conv_0"])
    load_conv(tca.q, fl["Conv_1"])
    load_conv(tca.out, fl["Conv_2"])


def load_rba(trba, fl):
    rb = fl["ResnetBlock_0"]
    load_gn(trba.res_block.block1.block[0], rb["ConvBlock_0"]["GroupNorm_0"])
    load_conv(trba.res_block.block1.block[3], rb["ConvBlock_0"]["Conv_0"])
    load_linear(trba.res_block.noise_func.noise_func[0], rb["Dense_0"])
    load_gn(trba.res_block.block2.block[0], rb["ConvBlock_1"]["GroupNorm_0"])
    load_conv(trba.res_block.block2.block[3], rb["ConvBlock_1"]["Conv_0"])
    if "Conv_0" in rb:
        load_conv(trba.res_block.res_conv, rb["Conv_0"])
    if "SelfAttention2D_0" in fl:
        sa = fl["SelfAttention2D_0"]
        load_gn(trba.attn.norm, sa["GroupNorm_0"])
        load_conv(trba.attn.qkv, sa["Conv_0"])
        load_conv(trba.attn.out, sa["Conv_1"])


def transfer_unet(params, tm, channel_mults=(1, 2, 4, 4), res_blocks=1):
    p = params["params"]
    load_conv(tm.downs[0], p["conv_in"])
    n = len(channel_mults)
    rba = dn = up = 0
    ti = 1
    for ind in range(n):
        for _ in range(res_blocks):
            load_rba(tm.downs[ti], p[f"ResnetBlockWithAttn_{rba}"])
            rba += 1
            ti += 1
        if ind != n - 1:
            load_conv(tm.downs[ti].conv, p[f"Downsample_{dn}"]["Conv_0"])
            dn += 1
            ti += 1
    for m in tm.mid:
        load_rba(m, p[f"ResnetBlockWithAttn_{rba}"])
        rba += 1
    ti = 0
    for ind in range(n):
        for _ in range(res_blocks + 1):
            load_rba(tm.ups[ti], p[f"ResnetBlockWithAttn_{rba}"])
            rba += 1
            ti += 1
        if ind != n - 1:
            load_conv(tm.ups[ti].conv, p[f"Upsample_{up}"]["Conv_0"])
            up += 1
            ti += 1
    for i, ca in enumerate(tm.hf_ca_list):
        load_ca(ca, p[f"HFGuidedCrossAttention_{i}"])
    load_fd(tm.fd_spliter, p["fd_spliter"])
    mlp = p["NoiseLevelMLP_0"]
    load_linear(tm.noise_level_mlp[1], mlp["Dense_0"])
    load_linear(tm.noise_level_mlp[3], mlp["Dense_1"])
    load_gn(tm.final_conv.block[0], p["final_conv"]["GroupNorm_0"])
    load_conv(tm.final_conv.block[3], p["final_conv"]["Conv_0"])


def nhwc(t):
    return np.asarray(t.detach()).transpose(0, 2, 3, 1)


def nchw(a):
    return torch.from_numpy(np.asarray(a, np.float32).transpose(0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Component tests
# ---------------------------------------------------------------------------


def test_resse_matches_seblock(rng):
    x = rng.standard_normal((2, 8, 8, 2), np.float32)
    se = SEBlock(reduction=2)
    params = se.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_j = se.apply(params, jnp.asarray(x))

    tse = ResSEFixed(2, reduction=2)
    load_se(tse, params["params"])
    with torch.no_grad():
        out_t = tse(nchw(x))
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=1e-6, rtol=1e-5)


def test_dwt_queries_match(rng):
    x = rng.standard_normal((2, 1, 64, 64), np.float32)
    qs_j = haar_dwt_highpass_sum(jnp.asarray(x), 3)
    with torch.no_grad():
        qs_t = dwt_queries_torch(torch.from_numpy(x), 3)
    for a, b in zip(qs_j, qs_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-5, rtol=1e-5)


def test_noise_mlp_matches(rng):
    gamma = np.array([0.1, 0.73, 0.99], np.float32)
    mlp = NoiseLevelMLP(32)
    params = mlp.init(jax.random.PRNGKey(1), jnp.asarray(gamma))
    out_j = mlp.apply(params, jnp.asarray(gamma))

    tm = tnn.Sequential(
        PositionalEncoding(32), tnn.Linear(32, 128), Swish(), tnn.Linear(128, 32)
    )
    load_linear(tm[1], params["params"]["Dense_0"])
    load_linear(tm[3], params["params"]["Dense_1"])
    with torch.no_grad():
        out_t = tm(torch.from_numpy(gamma))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5, rtol=1e-5)


def test_fd_spliter_matches(rng):
    size = 64
    x = rng.standard_normal((1, size, size, 2), np.float32)
    emb = rng.standard_normal((1, 32), np.float32)
    fd = FDInfoSpliter(emb_dim=32, image_size=size)
    params = fd.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(emb))
    out_j = fd.apply(params, jnp.asarray(x), jnp.asarray(emb))

    tfd = FDInfoSpliterTorch(32, size)
    load_fd(tfd, params["params"])
    with torch.no_grad():
        out_t = tfd(nchw(x), torch.from_numpy(emb))
    np.testing.assert_allclose(np.asarray(out_j), nhwc(out_t), atol=2e-5, rtol=1e-4)


def test_hf_ca_matches(rng):
    c, hw = 32, 16
    x = rng.standard_normal((1, hw, hw, c), np.float32)
    q = rng.standard_normal((1, hw, hw, 1), np.float32)
    ca = HFGuidedCrossAttention(groups=16)
    params = ca.init(jax.random.PRNGKey(3), jnp.asarray(x), jnp.asarray(q))
    out_plain = ca.apply(params, jnp.asarray(x), jnp.asarray(q))
    out_s2d = ca.apply(params, jnp.asarray(x), jnp.asarray(q), s2d=True)

    tca = HFGuidedCATorch(c, norm_groups=16)
    load_ca(tca, params["params"])
    with torch.no_grad():
        out_t = tca(nchw(x), nchw(q))
    np.testing.assert_allclose(np.asarray(out_plain), nhwc(out_t), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_s2d), nhwc(out_t), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Full-forward differential test
# ---------------------------------------------------------------------------


def _full_forward_pair(rng, s2d_level0, attn_res=(8,)):
    size = 64
    x = rng.standard_normal((1, size, size, 2), np.float32).astype(np.float32)
    gamma = np.array([0.7], np.float32)

    unet = ResDiffUNet(
        image_size=size, norm_groups=16, dropout=0.0, attn_res=attn_res,
        s2d_level0=s2d_level0,
    )
    params = unet.init(jax.random.PRNGKey(4), jnp.asarray(x), jnp.asarray(gamma))
    out_j = unet.apply(params, jnp.asarray(x), jnp.asarray(gamma))

    tm = ResDiffUNetTorch(image_size=size, norm_groups=16, dropout=0.0, attn_res=attn_res)
    tm.eval()
    transfer_unet(params, tm)
    with torch.no_grad():
        out_t = tm(nchw(x), torch.from_numpy(gamma))
    return np.asarray(out_j), nhwc(out_t)


@pytest.mark.slow
def test_full_forward_matches_torch(rng):
    """Plain-path forward vs the torch twin (production mid-only-attention
    topology: at 64^2 with attn_res=(8,) the level-3/mid blocks carry
    self-attention — MORE attention sites than 256^2 production, all
    checked)."""
    out_j, out_t = _full_forward_pair(rng, s2d_level0=False)
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_forward_s2d_matches_torch(rng):
    """The space-to-depth execution (production default) against the SAME
    torch twin — proves the s2d rewrite is reference-exact end to end."""
    out_j, out_t = _full_forward_pair(rng, s2d_level0=True)
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)


def test_fftn_batch_quirk_documented(rng):
    """The reference's fftn couples batch elements at B>1 (it trained at
    B=1); our fft2-per-image generalisation intentionally diverges there.
    Assert the divergence exists so the documented deviation
    (ops/fourier.py:11-14) stays an honest claim."""
    size = 32
    x = rng.standard_normal((2, size, size, 2), np.float32)
    emb = rng.standard_normal((2, 32), np.float32)
    fd = FDInfoSpliter(emb_dim=32, image_size=size)
    params = fd.init(jax.random.PRNGKey(5), jnp.asarray(x), jnp.asarray(emb))
    out_j = fd.apply(params, jnp.asarray(x), jnp.asarray(emb))

    tfd = FDInfoSpliterTorch(32, size)
    load_fd(tfd, params["params"])
    with torch.no_grad():
        out_t = tfd(nchw(x), torch.from_numpy(emb))
    # channels 3/4 (x_lf, x_hf) flow from the FFT; they must differ at B=2
    assert np.abs(np.asarray(out_j)[..., 3:] - nhwc(out_t)[..., 3:]).max() > 1e-3


# ---------------------------------------------------------------------------
# Chain-level differential: the SR3 reverse chain (VERDICT round-2 item 3)
# ---------------------------------------------------------------------------
#
# The reference samples through the runtime-cloned ResDiff repo's
# ``GaussianDiffusion.test(continous=False)``: an ancestral p_sample loop
# over the tabulated schedule — x0 from eps with the gamma-conditioned
# denoiser, clamp to [-1, 1], posterior q(x_{t-1} | x_t, x0) mean, plus
# exp(0.5 * posterior_log_variance_clipped) noise gated at t > 0 (same
# posterior-step shape as ``src/adapters/res_srdiff.py:80-96``; SURVEY §3.3).
# Re-typed here in torch with every schedule quantity re-derived from the
# betas in float64 (NOT read back from the JAX Schedule), driven by the
# torch twin UNet, and compared against the JAX ``lax.scan`` sampler on the
# same weights and the SAME noise realizations.


def _sr3_schedule_np(T: int):
    """SR3 schedule quantities from the linear 1e-6 -> 1e-2 ramp
    (``ResDif_execution.ipynb`` cell 37), float64 -> float32 like the
    cloned repo's ``set_new_noise_schedule``."""
    betas = np.linspace(1e-6, 1e-2, T, dtype=np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    tab = {
        "sqrt_ac": np.sqrt(ac),
        "sqrt_1m_ac": np.sqrt(1.0 - ac),
        "ac": ac,
        "coef1": betas * np.sqrt(ac_prev) / (1.0 - ac),
        "coef2": (1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
        "log_var": np.log(np.maximum(post_var, post_var[1])),
    }
    return {k: v.astype(np.float32) for k, v in tab.items()}


def _chain_pair(rng, T=20, size=64):
    """(flax UNet + params + cond + x_T + per-step noises, torch twin)."""
    from mrisr_tpu.diffusion.schedules import make_schedule

    # Smooth bounded condition standing in for the stage-1 CNN output.
    base = rng.standard_normal((1, size, size, 1), np.float32)
    k = np.ones((7, 7), np.float32) / 49.0
    sm = np.stack(
        [
            np.convolve(row, k[0], mode="same")
            for row in base[0, :, :, 0]
        ]
    )
    cond = np.tanh(3.0 * (sm - sm.mean()) / (sm.std() + 1e-6))[None, :, :, None]
    cond = cond.astype(np.float32)

    unet = ResDiffUNet(image_size=size, norm_groups=16, dropout=0.0,
                       attn_res=(8,), s2d_level0=False)
    x = np.concatenate([cond, rng.standard_normal(cond.shape).astype(np.float32)], -1)
    params = unet.init(jax.random.PRNGKey(11), jnp.asarray(x), jnp.array([0.7], np.float32))

    tm = ResDiffUNetTorch(image_size=size, norm_groups=16, dropout=0.0, attn_res=(8,))
    tm.eval()
    transfer_unet(params, tm)

    sched = make_schedule("linear", T, 1e-6, 1e-2)
    x_T = rng.standard_normal(cond.shape).astype(np.float32)
    return unet, params, sched, cond, x_T, tm


def _jax_eps_fn(unet, params, cond):
    cond_j = jnp.asarray(cond)
    static = unet.apply(params, cond_j, method="compute_static")

    def eps_fn(x_t, gamma):
        inp = jnp.concatenate([cond_j, x_t], axis=-1)
        return unet.apply(params, inp, gamma, static=static)

    return eps_fn


@pytest.mark.slow
def test_sr3_ancestral_chain_matches_torch(rng):
    """Full ancestral reverse chain: JAX ``sr3_ancestral_sample`` (one
    ``lax.scan`` program, static FD/DWT precompute — the pipeline path)
    vs the reference-twin torch p_sample loop, identical weights and
    identical per-step noise."""
    from mrisr_tpu.pipelines.sampler import sr3_ancestral_sample

    T = 20
    unet, params, sched, cond, x_T, tm = _chain_pair(rng, T=T)
    key = jax.random.PRNGKey(7)

    out_j = np.asarray(
        jax.jit(
            lambda xT, k: sr3_ancestral_sample(
                sched, _jax_eps_fn(unet, params, cond), xT, k, num_steps=None
            )
        )(jnp.asarray(x_T), key)
    )

    # Replicate the scan's key walk host-side: per step k, sub = split(k);
    # p_step draws normal(sub, shape) (diffusion/ddpm.py:77).
    noises = []
    k = key
    for _ in range(T):
        k, sub = jax.random.split(k)
        noises.append(np.asarray(jax.random.normal(sub, x_T.shape, jnp.float32)))

    tab = _sr3_schedule_np(T)
    cond_t = nchw(cond)
    xt = nchw(x_T)
    with torch.no_grad():
        for i, t in enumerate(range(T - 1, -1, -1)):
            gamma = torch.from_numpy(tab["sqrt_ac"][t : t + 1])
            eps = tm(torch.cat([cond_t, xt], dim=1), gamma)
            x0 = (xt - float(tab["sqrt_1m_ac"][t]) * eps) / float(tab["sqrt_ac"][t])
            x0 = x0.clamp(-1.0, 1.0)
            mean = float(tab["coef1"][t]) * x0 + float(tab["coef2"][t]) * xt
            scale = math.exp(0.5 * float(tab["log_var"][t])) if t > 0 else 0.0
            xt = mean + scale * nchw(noises[i])
    out_t = nhwc(xt)

    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)

    # Metric agreement: both residual chains, scored as SR = cond + residual
    # against the condition itself, must agree to well under the 0.1 dB
    # fidelity bar.
    from mrisr_tpu.eval.metrics import compute_mri_metrics

    def score(res):
        sr = np.clip(cond + res, 0, 1).transpose(0, 3, 1, 2)
        gt = np.clip(cond, 0, 1).transpose(0, 3, 1, 2)
        m = compute_mri_metrics(jnp.asarray(sr), jnp.asarray(gt))
        return {kk: float(v) for kk, v in zip(("psnr", "ssim", "nmse", "hfen"), m)}

    mj, mt = score(out_j), score(out_t)
    assert abs(mj["psnr"] - mt["psnr"]) < 1e-3
    assert abs(mj["ssim"] - mt["ssim"]) < 1e-4


@pytest.mark.slow
def test_sr3_ddim_chain_matches_torch(rng):
    """K-step DDIM leg (the benched production chain, eta=0): JAX scan vs
    the torch twin stepping the same trailing-spaced timestep table with the
    deterministic DDIM update (Song et al. 2021; diffusion/ddim.py)."""
    from mrisr_tpu.diffusion.schedules import spaced_timesteps
    from mrisr_tpu.pipelines.sampler import sr3_ancestral_sample

    T, K = 20, 5
    unet, params, sched, cond, x_T, tm = _chain_pair(rng, T=T)
    key = jax.random.PRNGKey(9)

    out_j = np.asarray(
        jax.jit(
            lambda xT, k: sr3_ancestral_sample(
                sched, _jax_eps_fn(unet, params, cond), xT, k, num_steps=K
            )
        )(jnp.asarray(x_T), key)
    )

    tab = _sr3_schedule_np(T)
    ts = spaced_timesteps(T, K, "trailing")
    cond_t = nchw(cond)
    xt = nchw(x_T)
    with torch.no_grad():
        for i, t in enumerate(ts):
            tp = int(ts[i + 1]) if i + 1 < len(ts) else -1
            gamma = torch.from_numpy(tab["sqrt_ac"][t : t + 1])
            eps = tm(torch.cat([cond_t, xt], dim=1), gamma)
            ac_t = float(tab["ac"][t])
            ac_p = float(tab["ac"][tp]) if tp >= 0 else 1.0
            x0 = (xt - float(tab["sqrt_1m_ac"][t]) * eps) / float(tab["sqrt_ac"][t])
            x0 = x0.clamp(-1.0, 1.0)
            eps_c = (xt - math.sqrt(ac_t) * x0) / math.sqrt(1.0 - ac_t)
            xt = math.sqrt(ac_p) * x0 + math.sqrt(max(1.0 - ac_p, 0.0)) * eps_c
    out_t = nhwc(xt)

    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)
