"""Pytree-key coverage for torch-checkpoint conversion (VERDICT r1 item 3).

The reference loads pretrained diffusers SD1.5 weights
(``ResDif_execution.ipynb`` cell 11; models at ``src/adapters/res_srdiff.py``).
diffusers itself is not installed here, so coverage is pinned two ways:

1. **Round-trip**: flax params -> ``export_diffusers_tree`` (the documented
   inverse mapping) -> ``convert_*`` must land EVERY tensor back on the exact
   flax tree (same keys, same shapes, same values).  Any param the converter
   misses, or any extra key it invents, fails the tree comparison.
2. **Golden key names**: selected well-known diffusers state-dict keys must
   appear verbatim in the exported dict, so the inverse map (and hence the
   converter) is checked against the real public naming scheme, not merely
   against itself.

Numeric orientation (transpose rules) is separately pinned against
hand-built torch modules in test_convert_torch_parity below.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.convert import (
    convert_controlnet,
    convert_sd_unet,
    convert_vae,
    export_diffusers_tree,
)
from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL

TINY_UNET = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
TINY_VAE = dict(block_out_channels=(8, 8, 16, 16), latent_channels=4)


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flat(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def _assert_tree_equal(got, want):
    fg, fw = _flat(got), _flat(want)
    missing = sorted(set(fw) - set(fg))
    extra = sorted(set(fg) - set(fw))
    assert not missing and not extra, f"missing={missing[:8]} extra={extra[:8]}"
    for k in fw:
        assert fg[k].shape == fw[k].shape, f"{k}: {fg[k].shape} vs {fw[k].shape}"
        np.testing.assert_allclose(fg[k], fw[k], atol=0, rtol=0, err_msg=k)


def test_sd_unet_conversion_round_trip(key):
    unet = SDUNet(**TINY_UNET)
    params = unet.init(
        key, jnp.zeros((1, 16, 16, 4)), jnp.array([3]), jnp.zeros((1, 7, 16))
    )
    sd = export_diffusers_tree(params)
    # golden diffusers key names (public SD1.5 checkpoint scheme)
    for k in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.1.conv2.bias",
        "up_blocks.0.resnets.0.conv_shortcut.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert k in sd, f"golden diffusers key missing from export: {k}"
    _assert_tree_equal(convert_sd_unet(sd), params)


def test_vae_conversion_round_trip(key):
    vae = AutoencoderKL(**TINY_VAE)
    params = vae.init(key, jnp.zeros((1, 32, 32, 3)))
    sd = export_diffusers_tree(params)
    for k in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.resnets.0.conv1.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "encoder.conv_norm_out.weight",
        "encoder.conv_out.weight",
        "decoder.up_blocks.0.resnets.2.conv2.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert k in sd, f"golden diffusers key missing from export: {k}"
    _assert_tree_equal(convert_vae(sd), params)


def test_vae_conversion_accepts_legacy_attention_keys(key):
    """Pre-0.15 diffusers VAEs: query/key/value/proj_attn as 1x1 convs."""
    vae = AutoencoderKL(**TINY_VAE)
    params = vae.init(key, jnp.zeros((1, 32, 32, 3)))
    sd = export_diffusers_tree(params)
    legacy = {}
    ren = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn"}
    for k, w in sd.items():
        if "attentions.0." in k:
            for new, old in ren.items():
                if f".{new}." in k:
                    k = k.replace(f".{new}.", f".{old}.")
                    if w.ndim == 2:  # Linear [out, in] -> conv [out, in, 1, 1]
                        w = w[:, :, None, None]
                    break
        legacy[k] = w
    _assert_tree_equal(convert_vae(legacy), params)


def test_controlnet_conversion_round_trip(key):
    cn = ControlNet(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
    params = cn.init(
        key,
        jnp.zeros((1, 16, 16, 4)),
        jnp.array([3]),
        jnp.zeros((1, 7, 16)),
        jnp.zeros((1, 128, 128, 3)),
    )
    sd = export_diffusers_tree(params)
    for k in [
        "controlnet_cond_embedding.conv_in.weight",
        "controlnet_cond_embedding.blocks.3.weight",
        "controlnet_cond_embedding.conv_out.weight",
        "controlnet_down_blocks.2.weight",
        "controlnet_mid_block.weight",
        "down_blocks.1.attentions.1.transformer_blocks.0.attn2.to_k.weight",
    ]:
        assert k in sd, f"golden diffusers key missing from export: {k}"
    _assert_tree_equal(convert_controlnet(sd), params)


# ---------------------------------------------------------------------------
# Numeric orientation parity against hand-built torch modules
# ---------------------------------------------------------------------------


def test_resnet_block_matches_torch(key):
    """ResnetBlock2D + conversion vs an equivalent torch module.

    Pins conv/linear/groupnorm orientation rules on the block diffusers
    uses everywhere (norm1-conv1-temb-norm2-conv2 + shortcut).
    """
    import torch

    cin, cout, temb_dim = 6, 8, 12

    class TorchResnet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.GroupNorm(2, cin, eps=1e-5)
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
            self.time_emb_proj = torch.nn.Linear(temb_dim, cout)
            self.norm2 = torch.nn.GroupNorm(2, cout, eps=1e-5)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1)

        def forward(self, x, temb):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = h + self.time_emb_proj(torch.nn.functional.silu(temb))[:, :, None, None]
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            return self.conv_shortcut(x) + h

    torch.manual_seed(0)
    tm = TorchResnet().eval()
    x = np.random.default_rng(0).normal(size=(2, cin, 16, 16)).astype(np.float32)
    temb = np.random.default_rng(1).normal(size=(2, temb_dim)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    from mrisr_tpu.models.convert import convert_diffusers_tree
    from mrisr_tpu.models.sd_layers import ResnetBlock2D

    params = {"params": convert_diffusers_tree(tm.state_dict())}
    blk = ResnetBlock2D(cout, groups=2)
    got = blk.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(temb))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )


def test_vae_attention_matches_torch(key):
    """Single-head VAE attention + conversion vs equivalent torch module."""
    import torch

    c = 8

    class TorchAttn(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # groups must match gn_groups(8) = gcd(8, 32) = 8
            self.group_norm = torch.nn.GroupNorm(8, c, eps=1e-6)
            self.to_q = torch.nn.Linear(c, c)
            self.to_k = torch.nn.Linear(c, c)
            self.to_v = torch.nn.Linear(c, c)
            self.to_out = torch.nn.ModuleList([torch.nn.Linear(c, c)])

        def forward(self, x):
            b, ch, h, w = x.shape
            y = self.group_norm(x).reshape(b, ch, h * w).transpose(1, 2)
            q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
            a = torch.softmax(q @ k.transpose(1, 2) / ch**0.5, dim=-1)
            out = self.to_out[0](a @ v)
            return x + out.transpose(1, 2).reshape(b, ch, h, w)

    torch.manual_seed(0)
    tm = TorchAttn().eval()
    x = np.random.default_rng(0).normal(size=(2, c, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    from mrisr_tpu.models.convert import convert_diffusers_tree
    from mrisr_tpu.models.sd_layers import VAEAttention

    params = {"params": convert_diffusers_tree(tm.state_dict())}
    got = VAEAttention().apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )
