"""Golden verification of the llama-tokenizer SFT masking arithmetic.

The reference hardcodes ``-2`` on instruction lengths "for the LLaMA
tokenizer" (conversation_dataset.py:160-162) and strips duplicate BOS when
packing pre-tokenized prompts (pair_webdataset.py:98-100). The CPU test
suite's TinyTokenizer (whitespace, offset -1) cannot exercise either, so
these tests use :class:`LlamaLikeTokenizer` — a pure-python reproduction of
the legacy llama sentencepiece behaviors the arithmetic depends on (BOS
prepend, dummy "▁" prefix per segment, space-merges-into-next-word,
"</s>" splitting as a special token) — and assert token-exact properties:

  * the per-round cursor lands exactly on the conversation's total length
    (the mismatch path would void the sample);
  * the unmasked labels decode to EXACTLY the assistant responses + EOS;
  * an instruction offset of -1 or -3 (an off-by-one in either direction)
    breaks those properties, so a regression cannot pass silently.
"""

import numpy as np
import pytest

from merlin_tpu.utils.constants import IGNORE_INDEX
from merlin_tpu.utils.conversation import conv_vicuna_v1
from merlin_tpu.utils.tokenizer import LlamaLikeTokenizer
from merlin_tpu.data.conversation_dataset import mask_conversation_targets

Q1 = "What color is the sky during a clear day"
A1 = "The sky appears blue because of Rayleigh scattering of sunlight."
Q2 = "And at sunset"
A2 = "It shifts to red and orange as the light path lengthens."


def _render(pairs):
    conv = conv_vicuna_v1.copy()
    for q, a in pairs:
        conv.append_message(conv.roles[0], q)
        conv.append_message(conv.roles[1], a)
    return conv.get_prompt()


@pytest.fixture(scope="module")
def tok():
    corpus = [conv_vicuna_v1.system, "USER", "ASSISTANT", Q1, A1, Q2, A2]
    return LlamaLikeTokenizer(corpus, model_max_length=2048)


def _ids_and_labels(tok, conversation, offset=-2):
    ids = np.asarray(tok(conversation, truncation=True,
                         max_length=tok.model_max_length)["input_ids"][0],
                     np.int32)
    labels = mask_conversation_targets(
        conversation, ids, tok, pad_id=tok.pad_token_id,
        instruction_offset=offset, keep_bos=True)
    return ids, labels


def test_llama_round_cursor_exact(tok):
    """Per-round lengths must tile the full encoding exactly — the llama
    identity len(tok(round)) == tokens-the-round-occupies + 1 (BOS vs the
    consumed </s>)."""
    conversation = _render([(Q1, A1), (Q2, A2)])
    ids, labels = _ids_and_labels(tok, conversation)
    # the mismatch guard voids the whole sample; surviving = cursor exact
    assert not np.all(labels == IGNORE_INDEX)
    # and the last real token (round 2's </s>) is supervised
    assert labels[-1] == tok.eos_token_id


def test_llama_masking_unmasks_exactly_the_responses(tok):
    conversation = _render([(Q1, A1), (Q2, A2)])
    ids, labels = _ids_and_labels(tok, conversation)
    kept = ids[labels != IGNORE_INDEX]
    # supervised tokens decode to exactly the responses (each starting with
    # the "▁" merged from the " ASSISTANT: " separator's trailing space)
    assert tok.decode(kept) == f" {A1}</s> {A2}</s>"
    # and every instruction token is masked: unmasking anything from the
    # questions would leak prompt supervision
    masked = ids[labels == IGNORE_INDEX]
    decoded_masked = tok.decode(masked)
    assert A1.split()[2] not in decoded_masked  # "appears"
    assert Q1.split()[1] in decoded_masked      # "color"


@pytest.mark.parametrize("bad_offset", [-1, -3])
def test_llama_masking_off_by_one_fails(tok, bad_offset):
    """±1 on the instruction offset must visibly corrupt the labels —
    guards the constant against 'simplification'."""
    conversation = _render([(Q1, A1), (Q2, A2)])
    ids, labels = _ids_and_labels(tok, conversation, offset=bad_offset)
    kept = ids[labels != IGNORE_INDEX]
    assert tok.decode(kept) != f" {A1}</s> {A2}</s>"


def test_llama_single_round_with_image_tokens(tok):
    """Round arithmetic holds when the instruction embeds special image
    tokens (the multimodal SFT path)."""
    from merlin_tpu.utils.constants import (
        DEFAULT_IM_START_TOKEN, DEFAULT_IM_PATCH_TOKEN, DEFAULT_IM_END_TOKEN)

    tok2 = LlamaLikeTokenizer(
        [conv_vicuna_v1.system, "USER", "ASSISTANT", Q1, A1],
        model_max_length=2048)
    tok2.add_tokens([DEFAULT_IM_PATCH_TOKEN, DEFAULT_IM_START_TOKEN,
                     DEFAULT_IM_END_TOKEN])
    q = (DEFAULT_IM_START_TOKEN + DEFAULT_IM_PATCH_TOKEN * 4
         + DEFAULT_IM_END_TOKEN + " " + Q1)
    conversation = _render([(q, A1)])
    ids, labels = _ids_and_labels(tok2, conversation)
    kept = ids[labels != IGNORE_INDEX]
    assert tok2.decode(kept) == f" {A1}</s>"
    # image specials are instruction tokens -> all masked
    patch_id = tok2.convert_tokens_to_ids(DEFAULT_IM_PATCH_TOKEN)
    assert np.all(labels[ids == patch_id] == IGNORE_INDEX)


def test_packing_bos_dedup_with_llama_tokenizer():
    """Prompt + text both tokenize with BOS; packing must strip the text's
    duplicate so each packed pair carries exactly one
    (pair_webdataset.py:98-100 parity)."""
    from merlin_tpu.data.packing import PairPacker
    from merlin_tpu.utils.constants import (
        DEFAULT_IM_START_TOKEN, DEFAULT_IM_PATCH_TOKEN, DEFAULT_IM_END_TOKEN)
    from merlin_tpu.utils.tokenizer import SpecialIds

    tok = LlamaLikeTokenizer(
        ["describe the image", "a photo of a cat", "another caption here"],
        model_max_length=128)
    tok.add_tokens([DEFAULT_IM_PATCH_TOKEN, DEFAULT_IM_START_TOKEN,
                    DEFAULT_IM_END_TOKEN])
    sids = SpecialIds(
        pad=tok.pad_token_id, bos=tok.bos_token_id, eos=tok.eos_token_id,
        unk=tok.unk_token_id,
        image_patch=tok.convert_tokens_to_ids(DEFAULT_IM_PATCH_TOKEN),
        im_start=tok.convert_tokens_to_ids(DEFAULT_IM_START_TOKEN),
        im_end=tok.convert_tokens_to_ids(DEFAULT_IM_END_TOKEN))
    packer = PairPacker(tok, sids, image_token_len=4, model_max_length=128)
    sample = packer.pack([("describe the image", "a photo of a cat"),
                          (None, "another caption here")])
    ids, segs = sample.input_ids, sample.segment_ids
    for s in np.unique(segs):
        seg_ids = ids[segs == s]
        assert int((seg_ids == tok.bos_token_id).sum()) == 1, s
        assert seg_ids[0] == tok.bos_token_id
