"""Native CLIP BPE tokenizer parity vs transformers (VERDICT r1 item 4).

The reference tokenizes through ``transformers.CLIPTokenizer``
(``src/adapters/utils.py:117-145``).  The real CLIP vocab cannot be
downloaded here, so parity is pinned on a locally built mini vocab that has
the same structure (256 byte tokens, byte+``</w>`` tokens, merge chains,
specials) loaded by BOTH tokenizers from the same files.
"""
import numpy as np
import pytest

from mrisr_tpu.models.tokenizer import (
    CLIPBPETokenizer,
    build_mini_vocab,
    bytes_to_unicode,
)

WORDS = [
    "medical", "mri", "scan", "high", "resolution", "quality",
    "brain", "field", "low",
]
PROMPTS = [
    "medical mri scan, high resolution",
    "high quality t1 brain MRI, 3T field",
    "  Weird   spacing\tand CAPS  ",
    "unmergedword tokens!",
    "",
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    import json

    vocab, merges = build_mini_vocab(WORDS)
    d = tmp_path_factory.mktemp("clip_vocab")
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n",
        encoding="utf-8",
    )
    return d


def test_bytes_to_unicode_is_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_matches_transformers_clip_tokenizer(vocab_dir):
    from transformers import CLIPTokenizer

    ref = CLIPTokenizer(str(vocab_dir / "vocab.json"), str(vocab_dir / "merges.txt"))
    ours = CLIPBPETokenizer.from_pretrained(vocab_dir)
    assert ours.bos_token_id == ref.bos_token_id
    assert ours.eos_token_id == ref.eos_token_id

    for prompt in PROMPTS:
        want = ref(prompt, padding="max_length", max_length=32, truncation=True)
        got = ours(prompt, padding="max_length", max_length=32, truncation=True)
        np.testing.assert_array_equal(
            got["input_ids"][0], np.asarray(want["input_ids"]), err_msg=prompt
        )
        np.testing.assert_array_equal(
            got["attention_mask"][0], np.asarray(want["attention_mask"]), err_msg=prompt
        )


def test_merged_words_become_single_tokens(vocab_dir):
    tok = CLIPBPETokenizer.from_pretrained(vocab_dir)
    ids = tok.tokenize("medical mri scan")
    assert len(ids) == 3  # each trained word collapses to one BPE token


def test_truncation_ends_with_eos(vocab_dir):
    tok = CLIPBPETokenizer.from_pretrained(vocab_dir)
    out = tok("medical " * 50, max_length=8)["input_ids"][0]
    assert out[0] == tok.bos_token_id and out[-1] == tok.eos_token_id
    assert len(out) == 8


def test_decode_round_trip(vocab_dir):
    tok = CLIPBPETokenizer.from_pretrained(vocab_dir)
    ids = tok("medical mri scan, high resolution")["input_ids"]
    assert tok.decode(ids) == "medical mri scan , high resolution"
