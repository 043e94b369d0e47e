"""Multi-turn, multi-image chat demo REPL (reference engine/eval/demo.py —
which imports a nonexistent conv_templates as shipped).

Task modes (demo.py:269-279):
  Track  — image placeholder blocks (one per frame) PREPENDED to the query
  Detect — one image block APPENDED to the query
  ImgInd — explicit ``<image>`` tokens in the query are replaced in place

Each turn: 'img1.jpg,img2.jpg ; question'. Boxes in the answer are drawn
per frame and saved (demo.py:340-350). 'reset' clears the conversation.
"""

from __future__ import annotations

from typing import List, Optional

from merlin_tpu.eval.box_eval import postprocess
from merlin_tpu.eval.runner import EvalConfig, EvalModel
from merlin_tpu.utils import constants as C
from merlin_tpu.utils.conversation import conv_templates


def build_task_query(query: str, num_images: int, image_token_len: int,
                     task_mode: str = "ImgInd",
                     use_im_start_end: bool = True) -> str:
    block = C.image_placeholder(image_token_len, use_im_start_end)
    if task_mode == "Track":
        return block * num_images + query
    if task_mode == "Detect":
        return query + block
    # ImgInd
    if C.DEFAULT_IMAGE_TOKEN in query:
        return query.replace(C.DEFAULT_IMAGE_TOKEN, block)
    if num_images:
        return block * num_images + "\n" + query
    return query


def run_demo(bundle, *, task_mode: str = "ImgInd",
             eval_cfg: Optional[EvalConfig] = None,
             input_fn=input, print_fn=print, max_turns: int = 0):
    from merlin_tpu.data.images import load_image

    model = EvalModel(bundle, eval_cfg or EvalConfig(do_sample=True,
                                                     temperature=0.2))
    conv = conv_templates["v1"].copy()
    images: List = []
    turns = 0
    while True:
        try:
            line = input_fn("demo> ").strip()
        except (EOFError, KeyboardInterrupt):
            return
        if not line or line in ("quit", "exit"):
            return
        if line == "reset":
            conv = conv_templates["v1"].copy()
            images = []
            continue
        paths, sep, query = line.partition(";")
        if not sep:
            query, paths = paths, ""
        new_images = [load_image(p.strip())
                      for p in paths.split(",") if p.strip()]
        images.extend(new_images)

        qs = build_task_query(
            query.strip(), len(new_images), bundle.config.image_token_len,
            task_mode, bundle.config.use_im_start_end)
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)

        prompt = conv.get_prompt()
        enc = bundle.tokenizer(prompt)["input_ids"]
        import numpy as np
        import jax.numpy as jnp

        ids = np.asarray(enc[0] if enc and isinstance(enc[0], list) else enc,
                         np.int32)[None]
        imgs = model.preprocess_images(images)
        kwargs = {"images": jnp.asarray(imgs)} if imgs is not None else {}
        out = model._engine(bundle.params, ids, **kwargs)
        answer = model.decode_output(out[0])
        conv.messages[-1][1] = answer

        text, drawn = postprocess(answer, images[-1] if images else None)
        print_fn(f"ASSISTANT: {text}")
        if drawn is not None:
            path = f"/tmp/merlin_demo_turn{turns}.png"
            drawn.save(path)
            print_fn(f"[boxes drawn -> {path}]")
        turns += 1
        if max_turns and turns >= max_turns:
            return


def main():
    import argparse
    from merlin_tpu.models.builder import (
        build_model_tokenizer, init_or_load_params)
    from merlin_tpu.train.arguments import parse_args

    p = argparse.ArgumentParser()
    p.add_argument("--task-mode", default="ImgInd",
                   choices=["Track", "Detect", "ImgInd"])
    p.add_argument("--tiny", action="store_true")
    args, rest = p.parse_known_args()
    margs, dargs, targs = parse_args(rest)
    bundle = build_model_tokenizer(margs, dargs, targs, tiny=args.tiny)
    init_or_load_params(bundle, composite_checkpoint=margs.pretrain_model)
    run_demo(bundle, task_mode=args.task_mode)


if __name__ == "__main__":
    main()
