"""Prompt-lookup speculative decoding (greedy-exact, no draft model).

Beyond the reference (its serving loop decodes one token per forward,
model_worker.py:162-187): on TPU a decode forward is HBM-bandwidth-bound
— the 13.5 GB of 7B parameters are streamed once per call whether the
call scores 1 token or 5 — so verifying a k-token draft costs nearly the
same wall time as a single decode step. Drafts come from PROMPT LOOKUP
(n-gram continuation from the sequence's own history, the technique HF
ships as ``prompt_lookup_num_tokens``): free to propose, and highly
effective on input-grounded tasks (DocVQA/captioning/box traces echo
prompt spans).

Greedy speculative decoding is EXACT: emitted tokens are identical to
the plain `Generator`'s greedy output (asserted token-for-token in
tests/test_speculative.py) — acceptance only changes how many forwards
it takes.

TPU-first mechanics (all static shapes, one jitted ``lax.while_loop``):

  * every window runs ``draft_len + 1`` tokens: [last committed token,
    d_1..d_k] with per-row TRUE positions; the greedy targets
    g_j = argmax(logits_j) give the outcome directly — the emitted
    tokens are g_0..g_m where m is the accepted-prefix length
    (d_{j+1} == g_j), so each window advances m+1 >= 1 tokens;
  * the KV cache is SLOT-SPARSE: each window claims k+1 fresh slots for
    every row (a single shared write cursor — no per-row rollback, which
    would break the batch's shared-slot layout); rejected drafts' slots
    are invalidated after the fact by zeroing their validity ids, and
    the decoder's segment-equality masking makes them invisible while
    RoPE uses the true per-row positions stored alongside;
  * n-gram lookup is a vectorized shift-compare over the (b, L) token
    history — O(b * L * ngram) VPU compares per window, negligible.

Requires rope/learned positions (ALiBi's bias is computed from cache
SLOT distance on the multi-token path, which slot-sparsity would skew)
and the dense cache layout. Greedy only — sampled acceptance needs the
residual-distribution correction, out of scope.

Measured (v5e, 1.9B-class decoder, bf16): an 8-token verify window
costs 1.05x a single decode step (7.6 tokens per step-cost at full
acceptance); end-to-end even RANDOM weights loop enough for 2.8
tokens/window = 1.69x decode throughput. TOOLCHAIN NOTE — the round-3
XLA builds laid out weights differently for 2..64-token decode forwards
and hoisted ~3 GB of one-time relayout copies (did not fit beside
12.8 GB of 7B params on a 16 GB chip). The round-4 toolchain does NOT
reproduce this (tools/layout_probe.py: temp 0.0 GB at s_q=8, 32 layers,
scan and no-scan; bench serving_spec_bf16 runs 7B bf16 speculative
serving on one chip). If a future toolchain regresses, the probe
measures it in one compile and layout pinning is the lever it tests.

bf16 NOTE: parity with the plain Generator is bit-exact in f32 (CI) and
held exactly on hardware at 4 decoder layers; at 8+ RANDOM-weight
layers accumulated bf16 reduction-order differences between the 1-token
and (k+1)-token attention paths can flip near-tied argmaxes (the same
documented effect as dense-vs-paged decode, docs/ARCHITECTURE.md
numerics note). Trained checkpoints have O(1) logit gaps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from merlin_tpu.generate.decode import GenerateConfig
from merlin_tpu.models.decoder import init_kv_cache


class SpeculativeGenerator:
    """Greedy batch generation via prompt-lookup speculative windows.

    Produces exactly the same tokens as ``Generator`` with
    ``do_sample=False``; returns (tokens, n_windows) so callers can
    report the measured tokens-per-forward.
    """

    def __init__(self, model, gen_cfg: GenerateConfig, *,
                 draft_len: int = 4, ngram: int = 2):
        assert not gen_cfg.do_sample, "speculative decode is greedy-only"
        assert gen_cfg.kv_layout == "dense", "dense cache only"
        lm_cfg = model.cfg.lm if hasattr(model.cfg, "lm") else model.cfg
        assert getattr(lm_cfg, "positional", "rope") != "alibi", (
            "slot-sparse speculative cache skews ALiBi slot-distance bias")
        assert draft_len >= 1 and ngram >= 1
        self.model = model
        self.cfg = gen_cfg
        self.k = int(draft_len)
        self.ngram = int(ngram)

        cfg = gen_cfg
        k, ngram_ = self.k, self.ngram
        T = cfg.max_new_tokens
        stop_ids = jnp.asarray((cfg.eos_id,) + tuple(cfg.stop_token_ids),
                               jnp.int32)

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

        def propose(buf, cur):
            """Latest-occurrence n-gram continuation from history.

            buf: (b, L) token history; cur: (b,) valid length. Returns
            (b, k) draft (last-token repeats when no match — cheap and
            simply gets rejected)."""
            b, L = buf.shape
            tail = jnp.take_along_axis(
                buf, cur[:, None] - ngram_ + jnp.arange(ngram_)[None], axis=1)
            npos = L - ngram_ + 1
            match = jnp.ones((b, npos), bool)
            for t in range(ngram_):
                match &= buf[:, t:t + npos] == tail[:, t:t + 1]
            pos = jnp.arange(npos)[None]
            # continuation must start inside written history and not be
            # the tail's own occurrence
            match &= pos + ngram_ <= (cur - 1)[:, None]
            best = jnp.max(jnp.where(match, pos, -1), axis=1)     # (b,)
            has = best >= 0
            start = jnp.where(has, best + ngram_, 0)
            draft = jnp.take_along_axis(
                buf, jnp.clip(start[:, None] + jnp.arange(k)[None], 0, L - 1),
                axis=1)
            last = jnp.take_along_axis(buf, cur[:, None] - 1, axis=1)
            return jnp.where(has[:, None], draft, last)           # (b, k)

        def window(params, prev_tok, draft, cur, done, cache):
            """One (k+1)-token verify forward; returns greedy targets.

            ``cur``: (b,) count of committed tokens (prompt+generated).
            ``prev_tok`` is the LAST committed token — its K/V is not in
            the cache yet, so it leads the window at position cur-1."""
            ids = jnp.concatenate([prev_tok[:, None], draft], axis=1)
            positions = (cur - 1)[:, None] + jnp.arange(k + 1)[None]
            seg = jnp.where(done[:, None],
                            jnp.zeros((1, k + 1), jnp.int32),
                            jnp.ones((1, k + 1), jnp.int32))
            idx = cache["index"]
            logits, cache = model.apply(
                {"params": params}, ids, positions=positions,
                segment_ids=seg, kv_cache=cache)
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # (b, k+1)
            # accepted prefix: d_{j+1} matches greedy target g_j
            ok = jnp.cumprod(
                (g[:, :k] == draft).astype(jnp.int32), axis=1)
            m = ok.sum(axis=1)                                    # (b,)
            # invalidate rejected-draft slots: window slot j (0 = prev
            # token) stays valid iff j <= m; done rows wrote seg=0 already
            keep = ((jnp.arange(k + 1)[None] <= m[:, None])
                    & ~done[:, None]).astype(jnp.int32)
            seg_fixed = jax.lax.dynamic_update_slice(
                cache["seg"], keep, (0, idx))
            cache = dict(cache, seg=seg_fixed)
            return g, m, cache

        def decode_loop(params, first_logits, cache, lengths, buf):
            b = first_logits.shape[0]
            out = jnp.full((b, T), cfg.pad_id, jnp.int32)
            tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
            done0 = jnp.any(tok0[:, None] == stop_ids[None, :], -1)
            out = out.at[:, 0].set(tok0)
            buf = _scatter_rows(buf, lengths, tok0[:, None],
                                jnp.ones((b, 1), bool))
            gen0 = jnp.ones((b,), jnp.int32)

            def cond(state):
                w, done = state[0], state[4]
                return (w < T) & ~jnp.all(done)

            def body(state):
                (w, cache, lengths, gen, done, buf, out, prev) = state
                draft = propose(buf, lengths + gen)
                g, m, cache = window(params, prev, draft, lengths + gen,
                                     done, cache)
                # emitted tokens g_0..g_m, truncated at the first stop id
                # and the remaining budget
                cand = g                                       # (b, k+1)
                is_stop = jnp.any(
                    cand[..., None] == stop_ids[None, None, :], -1)
                upto = jnp.arange(k + 1)[None]
                # first stop position (k+1 when none)
                stop_at = jnp.min(
                    jnp.where(is_stop, upto, k + 1), axis=1)    # (b,)
                count = jnp.minimum(m + 1, stop_at + 1)
                count = jnp.minimum(count, T - gen)
                count = jnp.where(done, 0, count)
                emit_mask = upto < count[:, None]               # (b, k+1)
                out = _scatter_rows(out, gen, cand, emit_mask)
                buf = _scatter_rows(buf, lengths + gen, cand, emit_mask)
                hit_stop = jnp.any(is_stop & emit_mask, axis=1)
                gen = gen + count
                done = done | hit_stop | (gen >= T)
                prev = jnp.where(
                    done, prev,
                    jnp.take_along_axis(
                        cand, jnp.maximum(count - 1, 0)[:, None],
                        axis=1)[:, 0])
                return (w + 1, cache, lengths, gen, done, buf, out, prev)

            state = (jnp.int32(0), cache, lengths, gen0, done0, buf, out,
                     tok0)
            state = jax.lax.while_loop(cond, body, state)
            return state[6], state[0], state[3]

        self._prefill = jax.jit(prefill)
        self._decode_loop = jax.jit(decode_loop)

    def __call__(self, params, input_ids, *, images=None,
                 attention_mask=None):
        """Returns (tokens (b, max_new_tokens) int32, n_windows int,
        tokens_generated (b,))."""
        cfg = self.cfg
        input_ids = jnp.asarray(input_ids, jnp.int32)
        if attention_mask is None:
            attention_mask = input_ids != cfg.pad_id
        attention_mask = jnp.asarray(attention_mask)
        bucket = cfg.prompt_bucket
        if bucket and input_ids.shape[1] % bucket:
            pad = bucket - input_ids.shape[1] % bucket
            input_ids = jnp.pad(input_ids, ((0, 0), (0, pad)),
                                constant_values=cfg.pad_id)
            attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad)))
        b, s = input_ids.shape
        lm_cfg = (self.model.cfg.lm if hasattr(self.model.cfg, "lm")
                  else self.model.cfg)
        # slot-sparse cache: every window claims k+1 slots even when only
        # one token lands, so capacity is prompt + T windows * (k+1)
        cache = init_kv_cache(
            lm_cfg, b,
            max_len=s + 1 + cfg.max_new_tokens * (self.k + 1),
            dtype=cfg.cache_dtype)
        logits, cache, lengths = self._prefill(
            params, input_ids, images, attention_mask, cache)
        # token history for the n-gram lookup: prompt + generated
        buf = jnp.pad(input_ids,
                      ((0, 0), (0, cfg.max_new_tokens + 1)),
                      constant_values=cfg.pad_id)
        out, n_windows, gen = self._decode_loop(
            params, logits, cache, lengths, buf)
        return np.asarray(out), int(n_windows), np.asarray(gen)


def _scatter_rows(buf, start, vals, mask):
    """buf[i, start[i] + j] = vals[i, j] where mask[i, j] (drop OOB)."""
    b, w = vals.shape
    cols = start[:, None] + jnp.arange(w)[None]
    cols = jnp.where(mask, cols, buf.shape[1])  # OOB -> dropped
    return buf.at[jnp.arange(b)[:, None], cols].set(vals, mode="drop")
