"""Single-image QA (reference engine/eval/eval.py): one image + question ->
answer. Also usable as a smoke test of the whole decode stack."""

from __future__ import annotations

from typing import Optional

from merlin_tpu.data.images import load_image
from merlin_tpu.eval.runner import EvalConfig, EvalModel


def run(bundle, image_path: str, question: str,
        eval_cfg: Optional[EvalConfig] = None) -> str:
    eval_cfg = eval_cfg or EvalConfig(do_sample=True, temperature=1.0,
                                      max_new_tokens=1024)
    model = EvalModel(bundle, eval_cfg)
    return model.ask(question, [load_image(image_path)])
