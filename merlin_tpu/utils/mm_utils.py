"""Misc multimodal utilities (reference utils/mm_utils.py + utils/utils.py
leftovers not already covered elsewhere).

Already rebuilt elsewhere: expand2square (data/images.py + ops/image_ops),
KeywordsStoppingCriteria (generate/decode.keyword_hit), webdataset filters
(data/shards.has_caption_and_image).
"""

from __future__ import annotations

import io
import os
from typing import Optional


def load_image(image_file: str):
    """Open a local path or http(s) URL as RGB PIL (mm_utils.py:113-119)."""
    from PIL import Image

    if image_file.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(image_file, timeout=30) as resp:
            return Image.open(io.BytesIO(resp.read())).convert("RGB")
    return Image.open(image_file).convert("RGB")


def violates_moderation(text: str, api_key: Optional[str] = None) -> bool:
    """OpenAI moderation hook (reference utils/utils.py:102-120). Gated:
    returns False (allow) when no API key / client is available, matching
    the reference's failure-open behavior."""
    api_key = api_key or os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    try:
        import openai

        client = openai.OpenAI(api_key=api_key)
        out = client.moderations.create(input=text)
        return bool(out.results[0].flagged)
    except Exception:
        return False


def pretty_print_semaphore(sem) -> str:
    if sem is None:
        return "None"
    return f"Semaphore(value={sem._value}, locked={sem.locked()})"
