"""Golden tests for conversation prompt rendering.

The expected strings are derived from the reference template semantics
(mmgpt/utils/conversation.py:49-58,222-233): Vicuna v1 = SeparatorStyle.TWO
with sep=" " sep2="</s>". Training masks are computed by splitting on these
separators, so rendering must match byte-for-byte.
"""

from merlin_tpu.utils.conversation import (
    SeparatorStyle,
    conv_templates,
    conv_vicuna_v1,
    default_conversation,
)

SYSTEM = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's questions."
)


def test_vicuna_v1_single_round():
    c = conv_vicuna_v1.copy()
    c.append_message(c.roles[0], "Hello?")
    c.append_message(c.roles[1], "Hi there!")
    expected = SYSTEM + " " + "USER: Hello? " + "ASSISTANT: Hi there!</s>"
    assert c.get_prompt() == expected


def test_vicuna_v1_generation_prefix():
    c = conv_vicuna_v1.copy()
    c.append_message(c.roles[0], "What is in the image?")
    c.append_message(c.roles[1], None)
    prompt = c.get_prompt()
    assert prompt.endswith("ASSISTANT:")
    assert "</s>" not in prompt


def test_vicuna_v1_two_rounds():
    c = conv_vicuna_v1.copy()
    c.append_message(c.roles[0], "q1")
    c.append_message(c.roles[1], "a1")
    c.append_message(c.roles[0], "q2")
    c.append_message(c.roles[1], "a2")
    assert c.get_prompt() == SYSTEM + " USER: q1 ASSISTANT: a1</s>USER: q2 ASSISTANT: a2</s>"


def test_copy_is_independent():
    c = conv_vicuna_v1.copy()
    c.append_message(c.roles[0], "x")
    assert len(conv_vicuna_v1.messages) == 0


def test_default_is_vicuna_v1():
    assert default_conversation.version == "v1"
    assert default_conversation.sep_style == SeparatorStyle.TWO
    assert default_conversation.sep2 == "</s>"


def test_templates_exist():
    for name in ["v0", "v1", "vicuna_v1", "llama_2", "mpt", "plain", "default"]:
        assert name in conv_templates


def test_plain_template():
    c = conv_templates["plain"].copy()
    c.append_message(c.roles[0], "<image>\ncaption text")
    c.append_message(c.roles[1], "")
    assert c.get_prompt() == "<image>\ncaption text\n"


def test_image_tuple_hoist():
    c = conv_vicuna_v1.copy()
    c.append_message(c.roles[0], ("describe <image> please", object(), "Pad"))
    c.append_message(c.roles[1], None)
    prompt = c.get_prompt()
    assert "USER: <image>\ndescribe  please ASSISTANT:" in prompt
