"""Shared eval-model runner: prompt assembly + preprocessing + decode.

Factored out of the reference's per-benchmark boilerplate
(eval.py:37-79, eval_mmbench.py:61-116): every harness builds a Vicuna-v1
prompt with ``<im_start><im_patch>*N<im_end>`` image blocks, runs the jitted
decode engine (greedy/sample/beam), and echo-checks + strips the output.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from merlin_tpu.data.images import preprocess_pil
from merlin_tpu.generate.beam import BeamSearch
from merlin_tpu.generate.decode import GenerateConfig, Generator
from merlin_tpu.utils import constants as C
from merlin_tpu.utils.conversation import conv_templates


@dataclasses.dataclass
class EvalConfig:
    temperature: float = 1.0
    do_sample: bool = False
    num_beams: int = 1
    max_new_tokens: int = 1024
    conv_template: str = "v1"
    image_aspect_ratio: str = "resize"
    language: str = "en"
    # greedy-exact prompt-lookup speculative decode with K-token drafts
    # (generate/speculative.py); 0 = off. Greedy single-beam only —
    # big win on frame loops like the LaSOT tracking eval whose answers
    # echo box-trajectory text. (The r3 toolchain's multi-token weight-
    # relayout scratch no longer reproduces — tools/layout_probe.py.)
    speculative: int = 0


class EvalModel:
    """bundle (model+params+tokenizer) -> ask(question, images) -> text."""

    def __init__(self, bundle, eval_cfg: EvalConfig = EvalConfig()):
        self.bundle = bundle
        self.cfg = eval_cfg
        self.tokenizer = bundle.tokenizer
        gen_cfg = GenerateConfig(
            max_new_tokens=eval_cfg.max_new_tokens,
            do_sample=eval_cfg.do_sample, temperature=eval_cfg.temperature,
            num_beams=eval_cfg.num_beams,
            eos_id=self.tokenizer.eos_token_id,
            pad_id=self.tokenizer.pad_token_id)
        if eval_cfg.num_beams > 1:
            self._engine = BeamSearch(bundle.model, gen_cfg)
        elif eval_cfg.speculative and not eval_cfg.do_sample:
            from merlin_tpu.generate.speculative import SpeculativeGenerator

            spec = SpeculativeGenerator(bundle.model, gen_cfg,
                                        draft_len=eval_cfg.speculative)
            # same (params, ids, ...) -> (b, T) tokens surface as the
            # Generator: drop the window metrics, ignore rng (greedy)
            self._engine = (lambda *a, rng=None, **kw: spec(*a, **kw)[0])
        else:
            self._engine = Generator(bundle.model, gen_cfg)

    # ------------------------------------------------------------------
    def build_prompt(self, question: str, num_images: int = 1) -> str:
        """<image> occurrences (or a prepended block) become patch runs;
        returns the full conversation prompt ending at 'ASSISTANT:'."""
        placeholder = C.image_placeholder(
            self.bundle.config.image_token_len,
            self.bundle.config.use_im_start_end)
        if C.DEFAULT_IMAGE_TOKEN in question:
            qs = question.replace(C.DEFAULT_IMAGE_TOKEN, placeholder)
        elif num_images > 0:
            qs = placeholder + "\n" + question
        else:
            qs = question
        conv = conv_templates[self.cfg.conv_template].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        return conv.get_prompt()

    def preprocess_images(self, images: Sequence) -> Optional[np.ndarray]:
        """PIL images / uint8 arrays -> (1, n, S, S, 3) uint8."""
        if not images:
            return None
        out = []
        for img in images:
            if isinstance(img, np.ndarray):
                out.append(img)
            else:
                out.append(preprocess_pil(
                    img, self.bundle.config.vit.image_size,
                    self.cfg.image_aspect_ratio))
        return np.stack(out)[None].astype(np.uint8)

    def decode_output(self, tokens: np.ndarray) -> str:
        """Strip pads, EOS tail, surrounding whitespace."""
        eos = self.tokenizer.eos_token_id
        pad = self.tokenizer.pad_token_id
        toks = [int(t) for t in np.asarray(tokens).reshape(-1)]
        keep = []
        for t in toks:
            if t == eos:
                break
            if t != pad:
                keep.append(t)
        text = self.tokenizer.decode(keep, skip_special_tokens=True).strip()
        if text.endswith(C.DEFAULT_EOS_TOKEN):
            text = text[: -len(C.DEFAULT_EOS_TOKEN)].strip()
        return text

    def ask_batch(self, questions: Sequence[str],
                  images_per_question: Sequence[Sequence] = (),
                  rng=None) -> List[str]:
        """Batched QA: prompts pad to one bucketed length, one image slot
        set; a single jitted prefill+decode serves the whole batch (the
        reference shards eval across GPUs with one process each;
        on TPU the batch dim does it in-process)."""
        if not images_per_question:
            images_per_question = [()] * len(questions)
        enc_list = []
        for q_text, imgs in zip(questions, images_per_question):
            prompt = self.build_prompt(q_text, num_images=len(imgs))
            enc = self.tokenizer(prompt)["input_ids"]
            enc_list.append(np.asarray(
                enc[0] if enc and isinstance(enc[0], list) else enc,
                np.int32))
        max_len = max(len(e) for e in enc_list)
        pad = self.tokenizer.pad_token_id
        ids = np.full((len(enc_list), max_len), pad, np.int32)
        mask = np.zeros((len(enc_list), max_len), bool)
        for i, e in enumerate(enc_list):
            ids[i, : len(e)] = e
            mask[i, : len(e)] = True

        max_imgs = max((len(im) for im in images_per_question), default=0)
        imgs_arr = None
        if max_imgs:
            size = self.bundle.config.vit.image_size
            imgs_arr = np.zeros(
                (len(enc_list), max_imgs, size, size, 3), np.uint8)
            for i, imgs in enumerate(images_per_question):
                got = self.preprocess_images(imgs)
                if got is not None:
                    imgs_arr[i, : got.shape[1]] = got[0]
        kwargs = ({"images": jnp.asarray(imgs_arr)}
                  if imgs_arr is not None else {})
        if isinstance(self._engine, BeamSearch):
            out = self._engine(self.bundle.params, ids,
                               attention_mask=mask, **kwargs)
        else:
            out = self._engine(self.bundle.params, ids, rng=rng,
                               attention_mask=mask, **kwargs)
        return [self.decode_output(row) for row in out]

    def ask(self, question: str, images: Sequence = (),
            rng=None) -> str:
        prompt = self.build_prompt(question, num_images=len(images))
        enc = self.tokenizer(prompt)["input_ids"]
        ids = np.asarray(enc[0] if enc and isinstance(enc[0], list) else enc,
                         np.int32)[None]
        imgs = self.preprocess_images(images)
        kwargs = {"images": jnp.asarray(imgs)} if imgs is not None else {}
        if isinstance(self._engine, BeamSearch):
            out = self._engine(self.bundle.params, ids, **kwargs)
        else:
            out = self._engine(self.bundle.params, ids, rng=rng, **kwargs)
        return self.decode_output(out[0])
