"""MMBench harness (reference engine/eval/eval_mmbench.py rebuilt).

Reads the official TSV (base64 images, circular-shift sub-questions at
index offsets of 1e6), builds option-letter MCQ prompts with hint + CN/EN
answer instruction, decodes (beam-5 or greedy/sampled), writes predictions
as CSV+JSON (no xlsx dependency), then runs the rule-based circular
evaluator.
"""

from __future__ import annotations

import base64
import io
import json
import math
import os
from typing import Dict, List, Optional

from merlin_tpu.eval.evaluators.mmbench import eval_result
from merlin_tpu.eval.runner import EvalConfig, EvalModel

ALL_OPTIONS = ["A", "B", "C", "D"]
PROMPT_EN = "Answer with the option's letter from the given choices directly."
PROMPT_CN = "请直接回答选项字母。"


def is_none(value) -> bool:
    if value is None:
        return True
    if isinstance(value, float) and math.isnan(value):
        return True
    return isinstance(value, str) and value.lower() in ("nan", "none", "")


def get_options(row: Dict) -> List[str]:
    out = []
    for opt in ALL_OPTIONS:
        if is_none(row.get(opt)):
            break
        out.append(str(row[opt]))
    return out


def build_question(row: Dict, language: str = "en") -> str:
    question = str(row["question"])
    if not is_none(row.get("hint")):
        question = str(row["hint"]) + "\n" + question
    for letter, option in zip(ALL_OPTIONS, get_options(row)):
        question += f"\n{letter}. {option}"
    question += "\n" + (PROMPT_CN if language == "cn" else PROMPT_EN)
    return question


def load_tsv(path: str) -> List[Dict]:
    import pandas as pd

    df = pd.read_table(path)
    return df.to_dict("records")


def decode_b64_image(data: str):
    from PIL import Image

    return Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")


def run(bundle, eval_file: str, output_path: str,
        eval_cfg: Optional[EvalConfig] = None, *, limit: int = 0,
        score: bool = True, batch_size: int = 1) -> Dict:
    language = "cn" if "cn" in eval_file.lower() else "en"
    eval_cfg = eval_cfg or EvalConfig(num_beams=5, max_new_tokens=64,
                                      language=language)
    model = EvalModel(bundle, eval_cfg)

    rows = load_tsv(eval_file)
    if limit:
        rows = rows[:limit]
    predictions = []
    for start in range(0, len(rows), max(batch_size, 1)):
        chunk = rows[start: start + max(batch_size, 1)]
        questions = [build_question(r, language) for r in chunk]
        images = [[decode_b64_image(r["image"])] for r in chunk]
        if batch_size > 1:
            answers = model.ask_batch(questions, images)
        else:
            answers = [model.ask(q, im) for q, im in zip(questions, images)]
        for row, answer in zip(chunk, answers):
            rec = {"index": int(row["index"]),
                   "question": str(row["question"]), "prediction": answer}
            for opt in ALL_OPTIONS:
                if not is_none(row.get(opt)):
                    rec[opt] = str(row[opt])
            predictions.append(rec)

    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(predictions, f, indent=1, ensure_ascii=False)
    # MMBench submission format: the reference ships an .xlsx
    # (eval_mmbench.py:173 via openpyxl); written here dependency-free
    if output_path.endswith(".json"):
        from merlin_tpu.utils.xlsx import write_records_xlsx

        write_records_xlsx(output_path[:-5] + ".xlsx", predictions)

    if not score or "answer" not in rows[0]:
        return {"predictions": output_path}
    # full index kept: circular shifts rotate options so each sub-question
    # carries its own gt letter
    meta = [{"index": int(r["index"]), "answer": str(r["answer"]),
             "category": r.get("category", "na"),
             "l2-category": r.get("l2-category", "na")}
            for r in rows]
    results = eval_result(predictions, meta)
    with open(output_path.replace(".json", "_scores.json"), "w") as f:
        json.dump({k: v for k, v in results.items() if k != "per_index"},
                  f, indent=1)
    return results
