"""build_model_tokenizer / freeze-matrix / tokenizer tests."""

import numpy as np
import jax.numpy as jnp

from merlin_tpu.models.builder import build_model_tokenizer, init_or_load_params
from merlin_tpu.train.arguments import (
    DataArguments, ModelArguments, TrainingArguments)
from merlin_tpu.utils.tokenizer import TinyTokenizer, resize_embeddings_mean_init
from merlin_tpu.utils.constants import DEFAULT_IM_PATCH_TOKEN, image_placeholder


def _bundle(**model_kw):
    margs = ModelArguments(**model_kw)
    dargs = DataArguments(image_size=16)
    targs = TrainingArguments(gradient_checkpointing=False, model_max_length=64)
    return build_model_tokenizer(margs, dargs, targs, tiny=True), dargs


def test_build_tiny_bundle_and_forward():
    bundle, dargs = _bundle()
    assert dargs.num_patches == bundle.config.image_token_len == 4
    params = init_or_load_params(bundle)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 90, size=(1, 8)))
    logits, _ = bundle.model.apply({"params": params}, ids)
    assert logits.shape == (1, 8, bundle.config.lm.vocab_size)


def test_freeze_matrix():
    bundle, _ = _bundle(freeze_vision_tower=True, freeze_lm_model=True)
    mask = bundle.trainable_mask
    nl = bundle.config.vit.num_layers
    assert not mask(("vision_tower", "vit", "layers_0", "q_proj", "kernel"))
    assert mask(("projector", "conv", "kernel"))
    assert not mask(("lm", "layers_0", "attn", "q_proj", "kernel"))
    assert mask(("lm", "embed_tokens", "embedding"))  # via row mask
    assert bundle.embed_row_trainable is not None
    # trainable rows: appended rows + the actual special-token ids
    trainable_rows = set(np.flatnonzero(bundle.embed_row_trainable).tolist())
    expected = set(range(bundle.orig_vocab_size,
                         bundle.config.lm.vocab_size))
    expected |= {bundle.config.image_patch_id, bundle.config.im_start_id,
                 bundle.config.im_end_id}
    assert trainable_rows == expected


def test_last_vit_layer_always_frozen():
    bundle, _ = _bundle()  # nothing frozen
    last = f"layers_{bundle.config.vit.num_layers - 1}"
    assert not bundle.trainable_mask(("vision_tower", "vit", last, "mlp"))
    assert bundle.trainable_mask(("vision_tower", "vit", "layers_0", "mlp"))


def test_tiny_tokenizer_roundtrip_and_specials():
    tok = TinyTokenizer()
    tok.add_tokens([DEFAULT_IM_PATCH_TOKEN, "<im_start>", "<im_end>"])
    text = "USER: <im_start>" + DEFAULT_IM_PATCH_TOKEN * 3 + "<im_end> hi"
    ids = tok.encode(text)
    patch_id = tok.convert_tokens_to_ids(DEFAULT_IM_PATCH_TOKEN)
    assert ids.count(patch_id) == 3
    assert "hi" in tok.decode(ids, skip_special_tokens=True)


def test_resize_mean_init():
    emb = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = resize_embeddings_mean_init(emb, 6)
    assert out.shape == (6, 3)
    np.testing.assert_allclose(out[4], emb.mean(0))
    np.testing.assert_allclose(out[:4], emb)


def test_image_placeholder():
    assert image_placeholder(2) == "<im_start><im_patch><im_patch><im_end>"
    assert image_placeholder(1, use_start_end=False) == "<im_patch>"
