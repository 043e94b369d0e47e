"""Beam search decode (the reference's beam-5 MMBench path,
eval_mmbench.py:140-159, incl. the repeat_interleave-of-image-features hack
base_mmgpt.py:162-163 — here beams are expanded by gathering the KV cache,
no feature duplication at the model level).

Fully jitted, with HF ``generate``'s exact beam semantics (the reference
runs HF beam search, so eval parity depends on them):

  * each step ranks max(2, 1 + n_stop)*k candidates over (beams*vocab),
    HF's pool sizing, so stop tokens can never starve the beam refill;
  * an EOS candidate in the top-k ranks is BANKED as a finished
    hypothesis — normalized by the HF convention, raw score divided by
    the GENERATED length (counting the EOS) raised to
    ``length_penalty`` — and its beam slot is refilled from the next
    best continuation (HF does not freeze finished beams in place);
  * a batch row is done (early_stopping=False semantics) once k
    hypotheses are banked and the best attainable continuation score
    cannot beat the worst banked one;
  * at the token budget, still-alive beams join the hypothesis pool
    normalized by the final length, and the best hypothesis wins.
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

        lp = self.length_penalty

        # Candidate pool per step: HF sizes it max(2, 1 + n_eos) * k so
        # that even if every stop id lands in the top ranks there are
        # still k non-stop candidates to refill the alive beams (2k is
        # insufficient once len(stop_token_ids) > 1).
        n_cand = max(2, 2 + len(cfg.stop_token_ids)) * k

        def loop(params, first_logits, cache, lengths):
            b = first_logits.shape[0]
            V = first_logits.shape[-1]
            assert n_cand <= V, "needs vocab >= max(2,1+n_stop)*num_beams"
            T = cfg.max_new_tokens
            logits = jnp.repeat(first_logits, k, axis=0)       # (b*k, V)
            cache = expand(cache, b)
            lengths = jnp.repeat(lengths, k, axis=0)
            # beam 0 active, others start at -inf so step 1 fans out
            alive_scores = jnp.tile(
                jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (b,)).reshape(b, k)
            alive_seqs = jnp.full((b, k, T), cfg.pad_id, jnp.int32)
            fin_scores = jnp.full((b, k), NEG_INF)
            fin_seqs = jnp.full((b, k, T), cfg.pad_id, jnp.int32)
            done_b = jnp.zeros((b,), bool)

            stop_ids = jnp.asarray((cfg.eos_id,) + tuple(cfg.stop_token_ids),
                                   jnp.int32)

            def cond(state):
                i, done_b = state[0], state[7]
                return (i < T) & ~jnp.all(done_b)

            def body(state):
                (i, logits, cache, lengths, alive_scores, alive_seqs,
                 fin_scores, done_b, fin_seqs) = state
                logprobs = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1).reshape(b, k, V)
                total = alive_scores[..., None] + logprobs     # (b, k, V)
                s2k, i2k = jax.lax.top_k(total.reshape(b, k * V), n_cand)
                beam2k = i2k // V
                tok2k = (i2k % V).astype(jnp.int32)
                is_eos = jnp.any(
                    tok2k[..., None] == stop_ids[None, None, :], -1)

                seq2k = jnp.take_along_axis(
                    alive_seqs, beam2k[..., None], axis=1)     # (b, 2k, T)
                seq2k = jax.lax.dynamic_update_slice(
                    seq2k, tok2k[..., None], (0, 0, i))

                # --- bank EOS candidates in the top-k ranks (HF: an EOS
                # at rank >= k is discarded). Normalized by the full
                # sequence length EXCLUDING the eos (prompt + i), the HF
                # BeamHypotheses.add convention.
                rank_ok = jnp.arange(n_cand)[None, :] < k
                bankable = is_eos & rank_ok & ~done_b[:, None]
                # HF BeamHypotheses.add: sum_logprobs / generated_len**lp,
                # generated_len counting the EOS itself (i + 1)
                norm2k = s2k / jnp.maximum(i + 1.0, 1.0) ** lp
                bank = jnp.where(bankable, norm2k, NEG_INF)
                fin_scores2 = jnp.concatenate([fin_scores, bank], axis=1)
                fin_seqs2 = jnp.concatenate([fin_seqs, seq2k], axis=1)
                fin_scores, fin_idx = jax.lax.top_k(fin_scores2, k)
                fin_seqs = jnp.take_along_axis(
                    fin_seqs2, fin_idx[..., None], axis=1)

                # --- refill alive beams from the best non-EOS candidates
                alive_cand = jnp.where(is_eos, NEG_INF, s2k)
                alive_scores, pick = jax.lax.top_k(alive_cand, k)
                beam_sel = jnp.take_along_axis(beam2k, pick, axis=1)
                alive_seqs = jnp.take_along_axis(
                    seq2k, pick[..., None], axis=1)
                tok_sel = jnp.take_along_axis(tok2k, pick, axis=1)
                cache = _gather_beams(cache, beam_sel, b, k)
                tok_sel = jnp.where(done_b[:, None], cfg.pad_id, tok_sel)

                # --- done (early_stopping=False): k hypotheses banked AND
                # the best attainable continuation cannot beat the worst.
                # HF's heuristic scores the best RUNNING beam (post-refill,
                # stops excluded) at the current generated length — with
                # several stop ids the best raw candidate is often a stop,
                # and using it here would keep banking past the point HF
                # froze the row (divergence found by multi-stop parity).
                worst_fin = fin_scores[:, k - 1]
                best_possible = (alive_scores[:, 0]
                                 / jnp.maximum(i + 1.0, 1.0) ** lp)
                done_b = done_b | ((worst_fin > NEG_INF / 2)
                                   & (worst_fin >= best_possible))

                flat_tok = tok_sel.reshape(b * k)
                logits, cache = model.apply(
                    {"params": params}, flat_tok[:, None],
                    positions=lengths[:, None], kv_cache=cache)
                logits = logits[:, 0]
                return (i + 1, logits, cache, lengths + 1, alive_scores,
                        alive_seqs, fin_scores, done_b, fin_seqs)

            state = (jnp.int32(0), logits, cache, lengths, alive_scores,
                     alive_seqs, fin_scores, done_b, fin_seqs)
            state = jax.lax.while_loop(cond, body, state)
            (_, _, _, _, alive_scores, alive_seqs, fin_scores, done_b,
             fin_seqs) = state
            # finalize: not-done rows add their alive beams at the final
            # generated length (HF finalize generated_len convention)
            alive_norm = alive_scores / jnp.maximum(float(T), 1.0) ** lp
            alive_norm = jnp.where(done_b[:, None], NEG_INF, alive_norm)
            all_scores = jnp.concatenate([fin_scores, alive_norm], axis=1)
            all_seqs = jnp.concatenate([fin_seqs, alive_seqs], axis=1)
            best = jnp.argmax(all_scores, axis=1)
            return (jnp.take_along_axis(
                all_seqs, best[:, None, None], axis=1)[:, 0],
                jnp.take_along_axis(all_scores, best[:, None], axis=1))

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
