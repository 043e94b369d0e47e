"""Aux coverage: LLM-fallback MMBench evaluator, BLIP augmentation,
demo task-mode prompts, mm_utils, profiling StepTimer."""

import random

import numpy as np
import pytest

from merlin_tpu.data.augment import (
    RandomAugment, blip_eval_transform, blip_train_transform)
from merlin_tpu.eval.demo import build_task_query, run_demo
from merlin_tpu.eval.evaluators.mmbench_llm import (
    build_extraction_prompt, eval_result, extract_answer_from_item)
from merlin_tpu.utils.profiling import StepTimer, train_step_flops


def test_llm_extraction_uses_judge_when_rules_fail():
    item = {"question": "color?", "prediction": "I believe it is the azure one",
            "A": "red", "B": "azure-ish blue", "C": "green"}
    calls = []

    def judge(prompt):
        calls.append(prompt)
        return "B"

    out = extract_answer_from_item(item, judge)
    assert out == "B" and len(calls) == 1
    assert "Options:" in calls[0] and "azure" in calls[0]


def test_llm_extraction_rules_first_no_judge_call():
    item = {"question": "q", "prediction": "The answer is (C).",
            "A": "x", "B": "y", "C": "z"}
    def judge(prompt):  # pragma: no cover - must not be called
        raise AssertionError("judge called")
    assert extract_answer_from_item(item, judge) == "C"


def test_llm_eval_result_resolves_ambiguous():
    meta = [{"index": 1, "answer": "B"}]
    preds = [{"index": 1, "prediction": "definitely the azure-ish one",
              "A": "red", "B": "azure", "C": "green"}]
    res = eval_result(preds, meta, judge=lambda p: "B")
    assert res["overall"] == 1.0


def test_random_augment_and_blip_transforms():
    from PIL import Image

    img = Image.new("RGB", (60, 40), (120, 50, 30))
    rng = random.Random(0)
    aug = RandomAugment(2, 7, rng=rng)
    out = aug(img.copy())
    assert out.size == img.size

    arr = blip_train_transform(img, image_size=32, rng=random.Random(1))
    assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8
    arr2 = blip_eval_transform(img, image_size=32)
    assert arr2.shape == (32, 32, 3)


def test_demo_task_modes():
    q = build_task_query("track this", 2, 3, "Track")
    assert q.startswith("<im_start>") and q.count("<im_patch>") == 6
    q = build_task_query("find cats", 1, 3, "Detect")
    assert q.startswith("find cats") and q.endswith("<im_end>")
    q = build_task_query("in <image> what?", 1, 3, "ImgInd")
    assert "<image>" not in q and q.count("<im_patch>") == 3


def test_demo_repl_one_turn(tmp_path):
    from PIL import Image
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)
    from merlin_tpu.eval.runner import EvalConfig

    img_path = tmp_path / "im.jpg"
    Image.new("RGB", (32, 32), (5, 100, 5)).save(img_path)
    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=128),
        tiny=True)
    init_or_load_params(bundle)

    inputs = iter([f"{img_path} ; what is here", "quit"])
    outputs = []
    run_demo(bundle, eval_cfg=EvalConfig(max_new_tokens=3),
             input_fn=lambda _: next(inputs),
             print_fn=lambda *a, **k: outputs.append(a), max_turns=1)
    assert any("ASSISTANT" in str(o[0]) for o in outputs if o)


def test_mm_utils_moderation_failopen_and_load():
    from merlin_tpu.utils.mm_utils import violates_moderation

    assert violates_moderation("anything", api_key=None) is False


def test_step_timer_mfu():
    t = StepTimer(tokens_per_step=100, flops_per_step=1e12, peak_flops=1e13)
    t.tick()
    import time
    time.sleep(0.01)
    stats = t.tick()
    assert stats["tokens_per_sec"] > 0
    assert 0 < stats["mfu"] <= 10
    assert train_step_flops(1e9, 2048) == 8 * 1e9 * 2048
