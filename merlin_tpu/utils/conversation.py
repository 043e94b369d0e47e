"""Conversation prompt templates.

Behavioral rebuild of the reference's ``mmgpt/utils/conversation.py``:
a dataclass holding chat history plus a family of separator styles that
render it to a single prompt string. The reference ships only one global
``conv`` instance (Vicuna v1, conversation.py:222-233) and several eval
scripts import a ``conv_templates`` dict that does not exist there; we
provide both, fixing that gap.

Rendering rules (must match the reference exactly — training masks are
computed by splitting on these separators):

* ``TWO`` (vicuna v1): ``system + sep`` then alternating
  ``"ROLE: message" + sep_i`` where ``sep_i`` alternates between ``sep``
  (" ") and ``sep2`` ("</s>").  An empty/None message renders ``"ROLE:"``
  with no trailing separator (generation prefix).
* ``SINGLE``: ``system + sep`` then ``"ROLE: message" + sep`` per turn.
* ``MPT``: ``system + sep`` then ``role + message + sep`` (roles carry
  their own ``<|im_start|>``-style markers).
* ``PLAIN``: no roles; messages joined by alternating ``sep``/``sep2``.
* ``LLAMA_2``: ``[INST] ... [/INST]`` wrapping with ``<<SYS>>`` block in
  the first user turn.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Sequence, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()
    MPT = enum.auto()
    PLAIN = enum.auto()
    LLAMA_2 = enum.auto()


def _msg_text(message) -> str:
    """Messages may be (text, image, preprocess_mode) tuples in the UI path."""
    if isinstance(message, tuple):
        return message[0]
    return message


@dataclasses.dataclass
class Conversation:
    """Chat history plus the rules for rendering it into one prompt."""

    system: str
    roles: Tuple[str, str]
    messages: List[List]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "unknown"

    def get_prompt(self) -> str:
        messages = self.messages
        # UI path: the first user message may be (text, image, mode); hoist the
        # <image> token to the front of the text (reference behavior).
        if messages and isinstance(messages[0][1], tuple):
            messages = [list(m) for m in messages]
            first_role, first_msg = messages[0]
            text = first_msg[0].replace("<image>", "").strip()
            messages[0] = [first_role, "<image>\n" + text]

        if self.sep_style == SeparatorStyle.SINGLE:
            out = self.system + self.sep
            for role, message in messages:
                if message:
                    out += role + ": " + _msg_text(message) + self.sep
                else:
                    out += role + ":"
            return out

        if self.sep_style == SeparatorStyle.TWO:
            seps = (self.sep, self.sep2)
            out = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    out += role + ": " + _msg_text(message) + seps[i % 2]
                else:
                    out += role + ":"
            return out

        if self.sep_style == SeparatorStyle.MPT:
            out = self.system + self.sep
            for role, message in messages:
                if message:
                    out += role + _msg_text(message) + self.sep
                else:
                    out += role
            return out

        if self.sep_style == SeparatorStyle.PLAIN:
            seps = (self.sep, self.sep2)
            out = self.system
            for i, (_, message) in enumerate(messages):
                if message:
                    out += _msg_text(message) + seps[i % 2]
            return out

        if self.sep_style == SeparatorStyle.LLAMA_2:
            out = ""
            for i, (role, message) in enumerate(messages):
                if i == 0 and not message:
                    raise ValueError("first message must be non-empty")
                if not message:
                    continue
                text = _msg_text(message)
                if i == 0:
                    text = f"<<SYS>>\n{self.system}\n<</SYS>>\n\n" + text
                if i % 2 == 0:
                    out += self.sep + f"[INST] {text} [/INST]"
                else:
                    out += " " + text + " " + self.sep2
            return out.lstrip(self.sep)

        raise ValueError(f"invalid separator style: {self.sep_style}")

    def append_message(self, role: str, message) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
        )

    def dict(self) -> dict:
        return {
            "system": self.system,
            "roles": list(self.roles),
            "messages": [[r, _msg_text(m)] for r, m in self.messages],
            "offset": self.offset,
            "sep": self.sep,
            "sep2": self.sep2,
        }


# ---------------------------------------------------------------------------
# Templates
# ---------------------------------------------------------------------------

conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1",
)

conv_vicuna_v0 = Conversation(
    system=(
        "A chat between a curious human and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the human's questions."
    ),
    roles=("Human", "Assistant"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
    version="v0",
)

conv_llama_2 = Conversation(
    system=(
        "You are a helpful language and vision assistant. "
        "You are able to understand the visual content that the user provides, "
        "and assist the user with a variety of tasks using natural language."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
    version="llama_v2",
)

conv_mpt = Conversation(
    system="<|im_start|>system\nA conversation between a user and an LLM-based AI assistant. "
    "The assistant gives helpful and honest answers.",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
    version="mpt",
)

conv_plain = Conversation(
    system="",
    roles=("", ""),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    sep2="</s>",
    version="plain",
)

# Reference exposes one global ``conv`` = vicuna v1 (conversation.py:222).
conv = conv_vicuna_v1

conv_templates = {
    "v0": conv_vicuna_v0,
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llama_2": conv_llama_2,
    "mpt": conv_mpt,
    "plain": conv_plain,
    "default": conv_vicuna_v1,
}

default_conversation = conv_vicuna_v1
