"""Prompt-lookup speculative decoding: greedy-EXACT parity with the
plain Generator (the whole point — acceptance changes only how many
forwards it takes, never the tokens), plus evidence that accepted drafts
actually shrink the window count on a periodic sequence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from merlin_tpu.generate.decode import GenerateConfig, Generator
from merlin_tpu.generate.speculative import SpeculativeGenerator
from merlin_tpu.models.decoder import CausalLM
from merlin_tpu.models.families import tiny

V, PAD, EOS = 128, 0, 2


def _model_params(seed=0):
    model = CausalLM(tiny())
    ids = jnp.asarray(np.random.default_rng(0).integers(3, V, (1, 8)))
    params = model.init(jax.random.PRNGKey(seed), ids)["params"]
    return model, params


def _gen_cfg(T=24, **kw):
    kw.setdefault("prompt_bucket", 8)
    kw.setdefault("eos_id", EOS)
    return GenerateConfig(max_new_tokens=T, do_sample=False,
                          pad_id=PAD, cache_dtype=jnp.float32, **kw)


@pytest.mark.parametrize("k,ngram", [(3, 2), (5, 3), (1, 1)])
def test_speculative_matches_greedy_exactly(k, ngram):
    model, params = _model_params()
    cfg = _gen_cfg()
    rng = np.random.default_rng(7)
    # ragged batch: different prompt lengths, right-padded
    prompts = [rng.integers(3, V, size=n).tolist() for n in (5, 9, 3)]
    width = max(len(p) for p in prompts)
    ids = np.full((len(prompts), width), PAD, np.int32)
    mask = np.zeros_like(ids)
    for i, p in enumerate(prompts):
        ids[i, :len(p)] = p
        mask[i, :len(p)] = 1

    want = Generator(model, cfg)(params, ids, attention_mask=mask)
    got, n_windows, gen = SpeculativeGenerator(
        model, cfg, draft_len=k, ngram=ngram)(
        params, ids, attention_mask=mask)
    np.testing.assert_array_equal(got, want)
    assert n_windows <= cfg.max_new_tokens


def test_speculative_matches_greedy_with_eos_mid_batch():
    """A row that stops early must pad exactly like the Generator while
    other rows keep decoding through more windows."""
    model, params = _model_params(seed=3)
    # pick an eos the greedy continuation of row 0 actually emits
    cfg_probe = _gen_cfg(T=10)
    probe_ids = np.asarray([[5, 17, 33, 41, 9, 3, 7, 11]], np.int32)
    probe = Generator(model, cfg_probe)(params, probe_ids)
    eos = int(probe[0, 4])  # stop row 0 after ~5 tokens

    cfg = _gen_cfg(T=16, eos_id=eos)
    ids = np.asarray([[5, 17, 33, 41, 9, 3, 7, 11],
                      [99, 54, 23, 8, 120, 77, 31, 64]], np.int32)
    want = Generator(model, cfg)(params, ids)
    got, _, _ = SpeculativeGenerator(model, cfg, draft_len=4)(params, ids)
    np.testing.assert_array_equal(got, want)


class _CycleLM:
    """Deterministic next-token function next = (prev + 1) % 4 + 64: the
    4-cycle makes bigram history repeat almost immediately, so
    prompt-lookup drafts become perfect and windows advance
    draft_len+1 tokens after a short discovery ramp."""

    def __init__(self, real):
        self._real = real
        self.cfg = real.cfg

    def apply(self, variables, input_ids, **kw):
        logits, cache = self._real.apply(variables, input_ids, **kw)
        nxt = (input_ids + 1) % 4 + 64  # 4-cycle: bigrams repeat fast
        forced = jax.nn.one_hot(nxt, logits.shape[-1]) * 1e4
        return forced.astype(logits.dtype), cache


def test_speculative_accepts_on_periodic_sequence():
    real, params = _model_params()
    model = _CycleLM(real)
    cfg = _gen_cfg(T=30)
    ids = np.asarray([[70, 80, 90, 100, 110, 75, 85, 95]], np.int32)

    want = Generator(model, cfg)(params, ids)
    k = 4
    got, n_windows, gen = SpeculativeGenerator(
        model, cfg, draft_len=k, ngram=2)(params, ids)
    np.testing.assert_array_equal(got, want)
    assert int(gen[0]) == cfg.max_new_tokens
    # once the cycle is discovered every window lands k+1 tokens; allow
    # the discovery ramp but demand real multi-token acceptance
    assert n_windows <= cfg.max_new_tokens // 2, n_windows
