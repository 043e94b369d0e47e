"""Beam search decode (the reference's beam-5 MMBench path,
eval_mmbench.py:140-159, incl. the repeat_interleave-of-image-features hack
base_mmgpt.py:162-163 — here beams are expanded by gathering the KV cache,
no feature duplication at the model level).

Fully jitted: beams live as a flattened (batch*beams) batch; each step takes
top-k over (beams*vocab), gathers the KV cache along the beam axis, and
freezes finished beams (they extend only with pad at zero cost). Final
selection normalizes by length**length_penalty (HF default semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from merlin_tpu.generate.decode import GenerateConfig
from merlin_tpu.models.decoder import init_kv_cache

NEG_INF = -1.0e7


def _gather_beams(tree, beam_idx, batch: int, beams: int):
    """Reorder the (batch*beams) leading axis of every leaf by beam_idx."""
    def gather(x):
        shaped = x.reshape((batch, beams) + x.shape[1:])
        out = jnp.take_along_axis(
            shaped, beam_idx.reshape((batch, beams) + (1,) * (x.ndim - 1)),
            axis=1)
        return out.reshape((batch * beams,) + x.shape[1:])

    return jax.tree.map(
        lambda x: gather(x) if (hasattr(x, "ndim") and x.ndim >= 1
                                and x.shape[0] == batch * beams) else x,
        tree)


class BeamSearch:
    def __init__(self, model, gen_cfg: GenerateConfig,
                 length_penalty: float = 1.0):
        assert gen_cfg.num_beams > 1
        self.model = model
        self.cfg = gen_cfg
        self.length_penalty = length_penalty

        cfg = gen_cfg
        k = cfg.num_beams

        def prefill(params, input_ids, images, attention_mask, cache):
            kwargs = {"images": images} if images is not None else {}
            b, s = input_ids.shape
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            logits, cache = model.apply(
                {"params": params}, input_ids,
                segment_ids=attention_mask.astype(jnp.int32),
                positions=positions, kv_cache=cache, **kwargs)
            lengths = attention_mask.sum(axis=1).astype(jnp.int32)
            next_logits = jnp.take_along_axis(
                logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
            return next_logits, cache, lengths

        def expand(tree, b):
            """(b, ...) -> (b*k, ...) by repeating each row k times."""
            return jax.tree.map(
                lambda x: jnp.repeat(x, k, axis=0)
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b
                else x, tree)

        def loop(params, first_logits, cache, lengths):
            b = first_logits.shape[0]
            V = first_logits.shape[-1]
            logits = jnp.repeat(first_logits, k, axis=0)       # (b*k, V)
            cache = expand(cache, b)
            lengths = jnp.repeat(lengths, k, axis=0)
            # beam 0 active, others start at -inf so step 1 fans out
            scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (b,))
            scores = scores.reshape(b, k)
            done = jnp.zeros((b, k), bool)
            seqs = jnp.full((b, k, cfg.max_new_tokens), cfg.pad_id, jnp.int32)
            gen_len = jnp.zeros((b, k), jnp.int32)

            stop_ids = jnp.asarray((cfg.eos_id,) + tuple(cfg.stop_token_ids),
                                   jnp.int32)

            def cond(state):
                i, _, _, _, _, done, _, _ = state
                return (i < cfg.max_new_tokens) & ~jnp.all(done)

            def body(state):
                i, logits, cache, lengths, scores, done, seqs, gen_len = state
                logprobs = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1).reshape(b, k, V)
                # finished beams: only pad, at no added cost
                pad_only = jnp.full((V,), NEG_INF).at[cfg.pad_id].set(0.0)
                logprobs = jnp.where(done[..., None], pad_only[None, None],
                                     logprobs)
                total = scores[..., None] + logprobs          # (b, k, V)
                flat = total.reshape(b, k * V)
                top_scores, top_idx = jax.lax.top_k(flat, k)  # (b, k)
                beam_idx = top_idx // V
                token = (top_idx % V).astype(jnp.int32)

                cache = _gather_beams(cache, beam_idx, b, k)
                seqs = jnp.take_along_axis(seqs, beam_idx[..., None], axis=1)
                done_g = jnp.take_along_axis(done, beam_idx, axis=1)
                gen_len = jnp.take_along_axis(gen_len, beam_idx, axis=1)

                seqs = jax.lax.dynamic_update_slice(
                    seqs, token[..., None], (0, 0, i))
                newly_done = jnp.any(
                    token[..., None] == stop_ids[None, None, :], -1)
                gen_len = jnp.where(done_g, gen_len, gen_len + 1)
                done = done_g | newly_done

                flat_tok = token.reshape(b * k)
                logits, cache = model.apply(
                    {"params": params}, flat_tok[:, None],
                    positions=lengths[:, None], kv_cache=cache)
                logits = logits[:, 0]
                return (i + 1, logits, cache, lengths + 1, top_scores, done,
                        seqs, gen_len)

            state = (jnp.int32(0), logits, cache, lengths, scores, done, seqs,
                     gen_len)
            state = jax.lax.while_loop(cond, body, state)
            _, _, _, _, scores, done, seqs, gen_len = state
            norm = scores / jnp.maximum(
                gen_len.astype(jnp.float32), 1.0) ** self.length_penalty
            best = jnp.argmax(norm, axis=1)
            return jnp.take_along_axis(
                seqs, best[:, None, None], axis=1)[:, 0], norm

        self._prefill = jax.jit(prefill)
        self._loop = jax.jit(loop)

    def __call__(self, params, input_ids, *, images=None,
                 attention_mask=None) -> np.ndarray:
        cfg = self.cfg
        input_ids = jnp.asarray(input_ids, jnp.int32)
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = input_ids != cfg.pad_id
        attention_mask = jnp.asarray(attention_mask)
        lm_cfg = (self.model.cfg.lm if hasattr(self.model.cfg, "lm")
                  else self.model.cfg)
        cache = init_kv_cache(lm_cfg, b, max_len=s + cfg.max_new_tokens,
                              dtype=cfg.cache_dtype)
        logits, cache, lengths = self._prefill(
            params, input_ids, images, attention_mask, cache)
        # _loop expands logits/cache/lengths to (b*num_beams) internally
        seqs, _ = self._loop(params, logits, cache, lengths)
        return np.asarray(seqs)
