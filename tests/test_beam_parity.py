"""Beam-search parity vs HF transformers' beam search (the reference's
MMBench beam-5 path, eval_mmbench.py:140-159, incl. generating from
spliced inputs_embeds like base_mmgpt.py:162-163).

HF semantics that must survive: log_softmax accumulation, EOS hypothesis
banking (an EOS candidate is stored and the beam replaced by the next
best continuation — NOT frozen in place), early_stopping=False best-case
continuation check, and final selection by score / len**length_penalty.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from merlin_tpu.generate.beam import BeamSearch
from merlin_tpu.generate.decode import GenerateConfig
from merlin_tpu.models.convert import decoder_params_from_hf
from merlin_tpu.models.decoder import CausalLM
from merlin_tpu.models.families import tiny

V, PAD = 128, 0


def _hf_and_ours(seed=0):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = LlamaConfig(
        vocab_size=V, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, attention_bias=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = tiny()
    params = jax.tree.map(
        jnp.asarray,
        decoder_params_from_hf(hf.state_dict(), cfg, family="llama"))
    return hf, CausalLM(cfg), params


def _pick_reachable_eos(hf, ids, steps=3):
    """An eos id the greedy continuation actually emits, so beams bank
    hypotheses mid-search instead of never stopping."""
    with torch.no_grad():
        out = hf.generate(torch.tensor(ids), max_new_tokens=steps,
                          do_sample=False, num_beams=1, pad_token_id=PAD)
    return int(out[0, -1])


@pytest.mark.parametrize("beams,new", [(3, 6), (5, 8)])
def test_beam_matches_hf_token_for_token(beams, new):
    hf, model, params = _hf_and_ours()
    ids = np.random.default_rng(1).integers(3, V, size=(2, 7))
    eos = _pick_reachable_eos(hf, ids)

    with torch.no_grad():
        theirs = hf.generate(
            torch.tensor(ids), num_beams=beams, max_new_tokens=new,
            do_sample=False, eos_token_id=eos, pad_token_id=PAD,
            early_stopping=False, length_penalty=1.0).numpy()[:, ids.shape[1]:]

    beam = BeamSearch(model, GenerateConfig(
        max_new_tokens=new, num_beams=beams, eos_id=eos, pad_id=PAD,
        cache_dtype=jnp.float32))
    ours = beam(params, ids)
    want = np.full_like(ours, PAD)
    want[:, :theirs.shape[1]] = theirs
    np.testing.assert_array_equal(ours, want)


def test_beam_matches_hf_with_multiple_stop_ids():
    """Several stop ids shrink the usable candidate pool: with HF's
    max(2, 1+n_eos)*k sizing the refill can never be starved of non-stop
    candidates. Regression for the fixed-2k pool."""
    hf, model, params = _hf_and_ours(seed=5)
    ids = np.random.default_rng(7).integers(3, V, size=(2, 6))
    eos = _pick_reachable_eos(hf, ids)
    # the reachable eos plus a spread of likely next tokens as extra stops
    with torch.no_grad():
        logits = hf(torch.tensor(ids)).logits[:, -1]
    extra = [int(t) for t in torch.topk(logits[0], 4).indices if int(t) != eos][:3]
    stops = [eos] + extra

    with torch.no_grad():
        theirs = hf.generate(
            torch.tensor(ids), num_beams=3, max_new_tokens=6,
            do_sample=False, eos_token_id=stops, pad_token_id=PAD,
            early_stopping=False, length_penalty=1.0).numpy()[:, ids.shape[1]:]

    beam = BeamSearch(model, GenerateConfig(
        max_new_tokens=6, num_beams=3, eos_id=eos, pad_id=PAD,
        stop_token_ids=tuple(extra), cache_dtype=jnp.float32))
    ours = beam(params, ids)
    # HF fills finished rows with eos_token_id[0] when pad_token_id=0
    # (`pad_token_id or eos_token_id[0]` treats 0 as unset) — compare each
    # row only up to its first stop token
    for r in range(ids.shape[0]):
        row = theirs[r]
        end = next((j for j, t in enumerate(row) if int(t) in stops),
                   len(row) - 1)
        np.testing.assert_array_equal(ours[r, :end + 1], row[:end + 1])
        assert (ours[r, end + 1:] == PAD).all()


class _SplicedLM:
    """Mimics the MMGPT composition for the beam path: <patch> token
    positions are replaced with fixed feature vectors at embedding level
    (the reference's inputs_embeds + repeat_interleave beam hack)."""

    def __init__(self, model, feats, patch_id):
        self._model, self._feats, self._patch = model, feats, patch_id
        self.cfg = model.cfg

    def apply(self, variables, input_ids, **kw):
        kw.pop("images", None)
        embeds = self._model.apply(variables, input_ids,
                                   method=CausalLM.embed)
        mask = (input_ids == self._patch)
        idx = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0,
                       self._feats.shape[0] - 1)
        spliced = jnp.where(mask[..., None],
                            self._feats[idx].astype(embeds.dtype), embeds)
        return self._model.apply(variables, inputs_embeds=spliced, **kw)


def test_beam_matches_hf_with_spliced_image_embeds():
    hf, model, params = _hf_and_ours(seed=2)
    rng = np.random.default_rng(3)
    patch_id = 9
    ids = rng.integers(10, V, size=(1, 8))
    ids[0, 2:5] = patch_id
    feats = rng.normal(scale=0.1, size=(3, 32)).astype(np.float32)

    with torch.no_grad():
        embeds = hf.model.embed_tokens(torch.tensor(ids))
        embeds[0, 2:5] = torch.tensor(feats)
        eos = int(hf.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones_like(torch.tensor(ids)),
            max_new_tokens=3, do_sample=False, num_beams=1,
            pad_token_id=PAD)[0, -1])
        theirs = hf.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones_like(torch.tensor(ids)),
            num_beams=3, max_new_tokens=6, do_sample=False,
            eos_token_id=eos, pad_token_id=PAD,
            early_stopping=False, length_penalty=1.0).numpy()

    spliced = _SplicedLM(model, jnp.asarray(feats), patch_id)
    beam = BeamSearch(spliced, GenerateConfig(
        max_new_tokens=6, num_beams=3, eos_id=eos, pad_id=PAD,
        cache_dtype=jnp.float32))
    ours = beam(params, ids)
    want = np.full_like(ours, PAD)
    want[:, :theirs.shape[1]] = theirs
    np.testing.assert_array_equal(ours, want)
