import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.models.sd_unet import SDUNet
from mrisr_tpu.models.vae import AutoencoderKL
from mrisr_tpu.models.clip_text import CLIPTextEncoder, HashTokenizer, get_fixed_prompt_embeds
from mrisr_tpu.models.controlnet import ControlNet
from mrisr_tpu.models.adapter import T2IAdapter
from mrisr_tpu.models.lora import (
    init_lora_params,
    apply_lora_delta,
    merge_lora,
    count_lora_params,
)

# Tiny configurations for CPU test speed; architecture identical to SD1.5.
TINY_UNET = dict(block_out_channels=(8, 16, 16, 16), heads=2, context_dim=16)
TINY_VAE = dict(block_out_channels=(8, 8, 16, 16), latent_channels=4)


def test_sd_unet_forward_shapes(key):
    unet = SDUNet(**TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 7, 16))
    params = unet.init(key, x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (1, 16, 16, 4)


def test_sd_unet_accepts_controlnet_residuals(key):
    unet = SDUNet(**TINY_UNET)
    cn = ControlNet(block_out_channels=TINY_UNET["block_out_channels"], heads=2, context_dim=16)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 7, 16))
    cond = jnp.zeros((1, 128, 128, 3))
    cn_params = cn.init(key, x, t, ctx, cond)
    down_res, mid_res = cn.apply(cn_params, x, t, ctx, cond)
    assert len(down_res) == 12  # conv_in + 3 blocks x (2 res + 1 down) + last block 2 res
    # zero-initialised output convs -> residuals are exactly zero at init
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down_res)
    assert float(jnp.abs(mid_res).max()) == 0.0

    unet_params = unet.init(key, x, t, ctx)
    base = unet.apply(unet_params, x, t, ctx)
    with_cn = unet.apply(
        unet_params, x, t, ctx,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid_res,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_cn), atol=1e-6)


def test_vae_roundtrip_shapes(key):
    vae = AutoencoderKL(**TINY_VAE)
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(key, x)
    z = vae.apply(params, x, method=vae.encode)
    assert z.shape == (1, 4, 4, 4)  # /8 spatial, 4 latent channels
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == (1, 32, 32, 3)
    # stochastic encode differs from mean encode
    z2 = vae.apply(params, x, jax.random.PRNGKey(1), method=vae.encode)
    assert float(jnp.abs(z - z2).max()) > 0


def test_t2i_adapter_feature_pyramid(key):
    ad = T2IAdapter(channels=(8, 16, 16, 16))
    cond = jnp.zeros((1, 128, 128, 3))
    params = ad.init(key, cond)
    feats = ad.apply(params, cond)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 8),
        (1, 8, 8, 16),
        (1, 4, 4, 16),
        (1, 2, 2, 16),
    ]


def test_adapter_features_feed_unet(key):
    unet = SDUNet(**TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jnp.zeros((1, 7, 16))
    params = unet.init(key, x, t, ctx)
    feats = [
        jnp.ones((1, 16, 16, 8)),
        jnp.ones((1, 8, 8, 16)),
        jnp.ones((1, 4, 4, 16)),
        jnp.ones((1, 2, 2, 16)),
    ]
    out = unet.apply(params, x, t, ctx, adapter_features=feats)
    base = unet.apply(params, x, t, ctx)
    assert float(jnp.abs(out - base).max()) > 0


def test_clip_matches_transformers_torch(key):
    """Golden parity: our CLIP vs transformers CLIPTextModel, same weights."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        eos_token_id=99,
        bos_token_id=98,
    )
    torch.manual_seed(0)
    tm = CLIPTextModel(cfg).eval()

    from mrisr_tpu.models.convert import convert_clip_text

    params = convert_clip_text(tm.state_dict(), num_layers=2)
    ours = CLIPTextEncoder(
        vocab_size=100, hidden=32, layers=2, heads=4, intermediate=64,
        max_positions=16, eos_token_id=99,
    )
    ids = np.array([[98, 5, 7, 99, 99, 99, 99, 99]], np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids.astype(np.int64)))
    got_hidden, got_pooled = ours.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got_hidden), ref.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(got_pooled), ref.pooler_output.numpy(), atol=2e-5)


def test_hash_tokenizer_and_fixed_embeds(key):
    tok = HashTokenizer()
    ids = tok(["medical mri scan", "another prompt"])["input_ids"]
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos_token_id
    enc = CLIPTextEncoder(vocab_size=49408, hidden=32, layers=1, heads=4, intermediate=64)
    params = enc.init(key, jnp.asarray(ids[:1]))
    emb = get_fixed_prompt_embeds(enc, params, tok)
    assert emb.shape == (1, 77, 32)


def test_lora_init_apply_merge(key):
    unet = SDUNet(**TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([1])
    ctx = jnp.ones((1, 7, 16))
    params = unet.init(key, x, t, ctx)

    lora = init_lora_params(key, params, rank=2)
    assert len(lora) > 0
    assert count_lora_params(lora) > 0

    # Zero-init B => delta-free at start
    merged0 = apply_lora_delta(params, lora)
    out_a = unet.apply(params, x, t, ctx)
    out_b = unet.apply(merged0, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    # Perturb B => outputs change; merge_lora equals apply_lora_delta
    lora2 = jax.tree_util.tree_map(lambda v: v + 0.05, lora)
    out_c = unet.apply(apply_lora_delta(params, lora2), x, t, ctx)
    assert float(jnp.abs(out_c - out_a).max()) > 0
    out_d = unet.apply(merge_lora(params, lora2), x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d), atol=1e-6)


def test_lora_grads_flow_only_to_lora(key):
    unet = SDUNet(**TINY_UNET)
    x = jnp.ones((1, 16, 16, 4))
    t = jnp.array([1])
    ctx = jnp.ones((1, 7, 16))
    params = unet.init(key, x, t, ctx)
    lora = init_lora_params(key, params, rank=2)

    def loss(lo):
        merged = apply_lora_delta(params, lo)
        return jnp.mean(unet.apply(merged, x, t, ctx) ** 2)

    g = jax.grad(loss)(lora)
    total = sum(float(jnp.abs(v).sum()) for ab in g.values() for v in ab.values())
    assert np.isfinite(total) and total > 0
