"""Evaluator + harness tests: MMBench option inference & circular rule,
VQA/ANLS metrics, box postprocess, tracking loop, runner smoke test."""

import json
import numpy as np
import pytest

from merlin_tpu.eval.evaluators.mmbench import (
    can_infer, can_infer_option, can_infer_text, eval_result, eval_sub_data)
from merlin_tpu.eval.evaluators.vqa_anls import (
    VQAEval, anls_score, exact_match, levenshtein, normalize_answer,
    relaxed_accuracy, vqa_accuracy)
from merlin_tpu.eval.box_eval import postprocess
from merlin_tpu.eval.tracking import parse_predicted_box, serialize_norm_box


# --- MMBench ----------------------------------------------------------------

def test_can_infer_option():
    assert can_infer_option("B") == "B"
    assert can_infer_option("The answer is (C).") == "C"
    assert can_infer_option("D.") == "D"
    assert can_infer_option("A dog runs in the field today") is False
    assert can_infer_option("maybe B or C") is False


def test_can_infer_text():
    choices = {"A": "cat", "B": "dog", "C": "fish"}
    assert can_infer_text("it looks like a dog to me", dict(choices)) == "B"
    assert can_infer_text("a cat and a dog", dict(choices)) is False


def test_circular_eval():
    answer_map = {1: "A", 2: "B"}
    sub_ok = [
        {"index": 1, "prediction": "A", "A": "x", "B": "y"},
        {"index": 1000001, "prediction": "The answer is A.", "A": "x", "B": "y"},
    ]
    # second shift: answer for main index 1 is still A per answer_map
    assert eval_sub_data(sub_ok, {1: "A", 1000001: "A"}) == 1
    sub_bad = [
        {"index": 2, "prediction": "B", "A": "x", "B": "y"},
        {"index": 1000002, "prediction": "A", "A": "x", "B": "y"},
    ]
    assert eval_sub_data(sub_bad, {2: "B", 1000002: "B"}) == 0


def test_eval_result_overall():
    meta = [{"index": 1, "answer": "A", "category": "c1", "l2-category": "l1"},
            # circular shift of q1: options rotated, answer letter differs
            {"index": 1000001, "answer": "B", "category": "c1",
             "l2-category": "l1"},
            {"index": 2, "answer": "B", "category": "c2", "l2-category": "l1"}]
    preds = [
        {"index": 1, "prediction": "A", "A": "x", "B": "y"},
        {"index": 1000001, "prediction": "B", "A": "y", "B": "x"},
        {"index": 2, "prediction": "C", "A": "x", "B": "y", "C": "z"},
    ]
    res = eval_result(preds, meta)
    assert res["overall"] == 0.5
    assert res["leaf"]["c1"] == 1.0 and res["leaf"]["c2"] == 0.0
    # one wrong circular shift sinks the whole question
    preds[1]["prediction"] = "A"
    assert eval_result(preds, meta)["overall"] == 0.0


# --- VQA / ANLS --------------------------------------------------------------

def test_normalize_answer():
    assert normalize_answer("The Cat!") == "cat"
    assert normalize_answer("two dogs") == "2 dogs"
    assert normalize_answer("dont") == "don't"


def test_vqa_accuracy_consensus():
    gts = ["yes"] * 8 + ["no"] * 2
    assert vqa_accuracy("yes", gts) == 1.0
    # only 2 annotators said "no": below the 3-consensus -> partial credit
    assert 0 < vqa_accuracy("no", gts) < 1.0
    assert vqa_accuracy("maybe", gts) == 0.0


def test_levenshtein_and_anls():
    assert levenshtein("kitten", "sitting") == 3
    assert anls_score("hello", ["hello"]) == 1.0
    assert anls_score("helo", ["hello"]) == pytest.approx(0.8)
    assert anls_score("completely wrong", ["hello"]) == 0.0


def test_relaxed_accuracy():
    assert relaxed_accuracy("104", "100") == 1.0
    assert relaxed_accuracy("106", "100") == 0.0
    assert relaxed_accuracy("blue", "blue") == 1.0


def test_vqaeval_dispatch():
    ev = VQAEval("DocVQA")
    out = ev.score({"q1": "the answer"}, {"q1": ["the answer", "other"]})
    assert out["overall"] == 1.0
    ev2 = VQAEval("VQAv2")
    out2 = ev2.score({"q1": "yes"}, {"q1": ["yes"] * 10})
    assert out2["overall"] == 1.0


# --- box / tracking ----------------------------------------------------------

def test_postprocess_draws_boxes():
    from PIL import Image

    img = Image.new("RGB", (100, 100))
    text, drawn = postprocess("object at [100, 200, 500, 600]", img)
    assert drawn is not None
    text2, drawn2 = postprocess("no boxes here", img)
    assert drawn2 is None


def test_tracking_box_roundtrip():
    nb = serialize_norm_box((64, 48, 320, 240), w=640, h=480)
    assert nb == (100, 100, 500, 500)
    parsed = parse_predicted_box("<Id1>[100, 100, 500, 500]</Id1>")
    assert parsed == [100, 100, 500, 500]
    assert parse_predicted_box("no box") is None


# --- runner smoke test (tiny model end to end) --------------------------------

def test_eval_model_ask_smoke():
    from merlin_tpu.eval.runner import EvalConfig, EvalModel
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)
    from PIL import Image

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=128),
        tiny=True)
    init_or_load_params(bundle)
    model = EvalModel(bundle, EvalConfig(max_new_tokens=4))
    img = Image.new("RGB", (32, 32), (120, 30, 40))
    out = model.ask("what is this", [img])
    assert isinstance(out, str)
    prompt = model.build_prompt("q", num_images=1)
    assert prompt.count("<im_patch>") == bundle.config.image_token_len
    assert prompt.endswith("ASSISTANT:")


@pytest.mark.slow
def test_eval_model_speculative_matches_plain():
    """EvalConfig(speculative=K) answers EXACTLY like the plain greedy
    path — with and without an image."""
    from merlin_tpu.eval.runner import EvalConfig, EvalModel
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)
    from PIL import Image

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=128),
        tiny=True)
    init_or_load_params(bundle)
    plain = EvalModel(bundle, EvalConfig(max_new_tokens=6))
    spec = EvalModel(bundle, EvalConfig(max_new_tokens=6, speculative=3))
    img = Image.new("RGB", (32, 32), (10, 200, 90))
    for q, imgs in [("track the object", [img]), ("hello", [])]:
        assert spec.ask(q, imgs) == plain.ask(q, imgs), (q, len(imgs))
    got = spec.ask_batch(["a question", "another longer question here"])
    want = plain.ask_batch(["a question", "another longer question here"])
    assert got == want


def test_eval_model_beam_smoke():
    from merlin_tpu.eval.runner import EvalConfig, EvalModel
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=128),
        tiny=True)
    init_or_load_params(bundle)
    model = EvalModel(bundle, EvalConfig(max_new_tokens=4, num_beams=3))
    out = model.ask("hello there", [])
    assert isinstance(out, str)


def test_box_golden_case_prompts():
    """The reference's hard-coded golden prompts (eval_box.py:278-284) build
    valid multimodal prompts through the shared runner."""
    from merlin_tpu.eval.box_eval import GOLDEN_CASES
    from merlin_tpu.eval.runner import EvalConfig, EvalModel
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import (
        DataArguments, ModelArguments, TrainingArguments)

    bundle = build_model_tokenizer(
        ModelArguments(), DataArguments(image_size=16),
        TrainingArguments(gradient_checkpointing=False, model_max_length=256),
        tiny=True)
    init_or_load_params(bundle)
    model = EvalModel(bundle, EvalConfig(max_new_tokens=2))
    for case in GOLDEN_CASES:
        n_imgs = case.count("<image>") or 1
        prompt = model.build_prompt(case, num_images=n_imgs)
        assert "<image>" not in prompt
        assert prompt.count("<im_start>") == n_imgs
        assert prompt.endswith("ASSISTANT:")
