"""SDXL dual-encoder prompt utilities (reference src/adapters/utils.py:76-113,165-182)."""
import jax
import jax.numpy as jnp
import numpy as np

from mrisr_tpu.models.clip_text import CLIPTextEncoder, HashTokenizer
from mrisr_tpu.models.sdxl_text import (
    CLIPTextEncoderWithProjection,
    compute_embeddings_sdxl,
    encode_prompt_sdxl,
    make_add_time_ids,
    maybe_drop_prompts,
)

TINY1 = dict(vocab_size=100, hidden=16, layers=3, heads=2, intermediate=32,
             max_positions=16, eos_token_id=99)
TINY2 = dict(vocab_size=100, hidden=24, layers=3, heads=2, intermediate=48,
             max_positions=16, eos_token_id=99, projection_dim=20)


class TinyTok(HashTokenizer):
    model_max_length = 16

    def __init__(self):
        super().__init__(vocab_size=100)
        self.bos_token_id, self.eos_token_id = 98, 99


def _towers(key):
    enc1 = CLIPTextEncoder(**TINY1)
    enc2 = CLIPTextEncoderWithProjection(**TINY2)
    ids = jnp.zeros((1, 16), jnp.int32)
    p1 = enc1.init(key, ids)
    p2 = enc2.init(key, ids)
    return (enc1, enc2), (p1, p2), (TinyTok(), TinyTok())


def test_encode_prompt_sdxl_shapes_and_pooling(key):
    encs, ps, toks = _towers(key)
    embeds, pooled = encode_prompt_sdxl(encs, ps, toks, ["a scan", "another"])
    assert embeds.shape == (2, 16, 16 + 24)  # channel concat of both towers
    assert pooled.shape == (2, 20)  # projection dim of tower 2


def test_penultimate_hidden_state_selected(key):
    """encode_prompt takes hidden_states[-2] (utils.py:97) — pin it."""
    encs, ps, toks = _towers(key)
    ids = jnp.asarray(toks[0](["a scan", "b"])["input_ids"])
    _, _, states = encs[0].apply(ps[0], ids, output_hidden_states=True)
    embeds, _ = encode_prompt_sdxl(encs, ps, toks, ["a scan", "b"])
    np.testing.assert_allclose(
        np.asarray(embeds[..., :16]), np.asarray(states[-2]), atol=0
    )


def test_compute_embeddings_time_ids(key):
    encs, ps, toks = _towers(key)
    out = compute_embeddings_sdxl(
        encs, ps, toks, ["x"],
        original_size=(512, 512), crops_coords_top_left=(1, 2), target_size=(256, 256),
    )
    assert set(out) == {"prompt_embeds", "text_embeds", "time_ids"}
    np.testing.assert_array_equal(
        np.asarray(out["time_ids"][0]), [512, 512, 1, 2, 256, 256]
    )


def test_cfg_dropout_proportion(key):
    prompts = ["p"] * 2000
    dropped = maybe_drop_prompts(prompts, key, proportion_empty_prompts=0.1)
    frac = sum(p == "" for p in dropped) / len(dropped)
    assert 0.07 < frac < 0.13
    # eval mode / proportion 0: no dropout
    assert maybe_drop_prompts(prompts, key, 0.0) == prompts
    assert maybe_drop_prompts(prompts, key, 0.5, is_train=False) == prompts


def test_add_time_ids_broadcast():
    ids = make_add_time_ids((64, 64), (0, 0), (32, 32), batch=3)
    assert ids.shape == (3, 6)


def test_projection_tower_matches_transformers(key):
    """Pooled projection parity vs transformers CLIPTextModelWithProjection."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        eos_token_id=99, bos_token_id=98, projection_dim=24,
    )
    torch.manual_seed(0)
    tm = CLIPTextModelWithProjection(cfg).eval()

    from mrisr_tpu.models.convert import convert_clip_text_with_projection

    params = convert_clip_text_with_projection(tm.state_dict(), num_layers=2)
    ours = CLIPTextEncoderWithProjection(
        vocab_size=100, hidden=32, layers=2, heads=4, intermediate=64,
        max_positions=16, eos_token_id=99, projection_dim=24,
    )
    ids = np.array([[98, 5, 7, 99, 99, 99, 99, 99]], np.int32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True)
    hidden, pooled, states = ours.apply(params, jnp.asarray(ids), output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(pooled), ref.text_embeds.numpy(), atol=2e-5
    )
    # penultimate hidden state parity (the tensor SDXL conditioning uses)
    np.testing.assert_allclose(
        np.asarray(states[-2]), ref.hidden_states[-2].numpy(), atol=2e-5
    )
