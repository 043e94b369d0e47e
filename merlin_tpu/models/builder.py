"""Model + tokenizer factory: the reference's ``build_model_tokenizer``
(model/builder.py:18) rebuilt for the TPU stack.

Responsibilities (reference parity, SURVEY.md §3.4):
  * name-substring LM dispatch + RoPE scaling rewrite (builder.py:25-70,37-42)
  * tokenizer with right padding, pad=unk, multimodal special tokens, and
    mean-initialized embedding rows for the added tokens (builder.py:76-98,
    base_mmgpt.py:54-76)
  * vision tower + projector attachment and image_token_len back-propagation
    into data args (base_mmgpt.py:23-52)
  * the freeze matrix: freeze_lm/vision/projector flags, last ViT layer
    always frozen, new-token embedding rows trainable while the rest of a
    frozen LM stays fixed (builder.py:131-160, base_mmgpt.py:78-97)
  * checkpoint loading incl. prefix re-extraction of tower/projector weights
    from composite checkpoints (clip_encoder.py:26-62, base_projector.py:12-48)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from merlin_tpu.models.decoder import DecoderConfig
from merlin_tpu.models.families import config_from_name, tiny as tiny_lm
from merlin_tpu.models.mmgpt import MMGPT, MMGPTConfig
from merlin_tpu.models.vit import ViTConfig, clip_vit_l14, tiny_vit
from merlin_tpu.utils.tokenizer import (
    SpecialIds, TinyTokenizer, load_tokenizer, resize_embeddings_mean_init,
    MM_SPECIAL_TOKENS)
from merlin_tpu.utils import constants as C


@dataclasses.dataclass
class ModelBundle:
    model: MMGPT
    config: MMGPTConfig
    tokenizer: Any
    special_ids: SpecialIds
    params: Optional[Dict[str, Any]]          # None until init/load
    orig_vocab_size: int                       # rows before special tokens
    trainable_mask: Optional[Dict[str, Any]] = None  # bool pytree
    embed_row_trainable: Optional[np.ndarray] = None  # per-row float mask


def _tiny_tokenizer_with_mm_tokens(model_max_length):
    tok = TinyTokenizer(model_max_length)
    tok.add_tokens(MM_SPECIAL_TOKENS, special_tokens=True)
    ids = SpecialIds(
        pad=tok.pad_token_id, bos=tok.bos_token_id, eos=tok.eos_token_id,
        unk=tok.unk_token_id,
        image_patch=tok.convert_tokens_to_ids(C.DEFAULT_IM_PATCH_TOKEN),
        im_start=tok.convert_tokens_to_ids(C.DEFAULT_IM_START_TOKEN),
        im_end=tok.convert_tokens_to_ids(C.DEFAULT_IM_END_TOKEN))
    return tok, ids, len(MM_SPECIAL_TOKENS)


def build_model_tokenizer(model_args, data_args, training_args,
                          *, tiny: bool = False) -> ModelBundle:
    """Construct the MMGPT model definition + tokenizer.

    ``tiny=True`` builds test-scale geometry with the TinyTokenizer. Params
    are NOT materialized here; call :func:`init_or_load_params` next (so
    multi-host/sharded init can happen under the caller's mesh).
    """
    dtype = jnp.bfloat16 if getattr(training_args, "bf16", True) else jnp.float32

    if tiny:
        lm_cfg = tiny_lm(remat=training_args.gradient_checkpointing,
                         scan_layers=getattr(model_args, "scan_layers",
                                             False))
        vit_cfg = tiny_vit()
        tokenizer, ids, num_added = _tiny_tokenizer_with_mm_tokens(
            training_args.model_max_length)
        orig_vocab = lm_cfg.vocab_size - num_added
    else:
        lm_cfg = config_from_name(
            model_args.model_name_or_path,
            model_max_length=training_args.model_max_length,
            dtype=dtype, remat=training_args.gradient_checkpointing)
        if getattr(model_args, "scan_layers", False):
            lm_cfg = dataclasses.replace(lm_cfg, scan_layers=True)
        from merlin_tpu.models.vision_builder import (
            default_vision_config, vision_kind_from_name)
        vision_kind = vision_kind_from_name(model_args.vision_tower or "clip")
        vit_cfg = default_vision_config(
            vision_kind, data_args.image_size, dtype=dtype)
        try:
            tokenizer, ids, num_added = load_tokenizer(
                model_args.model_name_or_path,
                model_max_length=training_args.model_max_length)
        except Exception:
            tokenizer, ids, num_added = _tiny_tokenizer_with_mm_tokens(
                training_args.model_max_length)
        orig_vocab = lm_cfg.vocab_size
        new_vocab = max(lm_cfg.vocab_size, len(tokenizer))
        if num_added:
            new_vocab = max(new_vocab, orig_vocab + num_added)
        lm_cfg = dataclasses.replace(lm_cfg, vocab_size=new_vocab)

    cfg = MMGPTConfig(
        lm=lm_cfg, vit=vit_cfg,
        projector=model_args.projector, conv_stride=model_args.conv_stride,
        vision_kind="clip" if tiny else vision_kind,
        select_layer=model_args.mm_vision_select_layer,
        select_feature=model_args.mm_vision_select_feature,
        use_im_start_end=model_args.mm_use_im_start_end,
        image_patch_id=ids.image_patch, im_start_id=ids.im_start,
        im_end_id=ids.im_end)

    # back-propagate tower geometry into data args (base_mmgpt.py:46-52)
    data_args.num_patches = cfg.image_token_len
    data_args.image_size = getattr(vit_cfg, "image_size",
                                   getattr(vit_cfg, "img_size", 448))

    bundle = ModelBundle(
        model=MMGPT(cfg), config=cfg, tokenizer=tokenizer, special_ids=ids,
        params=None, orig_vocab_size=orig_vocab)
    bundle.trainable_mask, bundle.embed_row_trainable = _freeze_masks(
        model_args, cfg, orig_vocab, ids)
    return bundle


def _freeze_masks(model_args, cfg: MMGPTConfig, orig_vocab: int,
                  ids: Optional[SpecialIds] = None):
    """Reference freeze matrix -> (per-subtree bool fn, embedding row mask).

    Returned ``trainable_mask`` is a function path->bool applied lazily by
    the optimizer. The embedding row mask implements "frozen LM but
    trainable new-token rows" (base_mmgpt.py:78-97).
    """
    last_layer = f"layers_{cfg.vit.num_layers - 1}"

    def trainable(path: Tuple[str, ...]) -> bool:
        if path[0] == "vision_tower":
            if last_layer in path:
                return False  # always-detached last ViT layer
            return not model_args.freeze_vision_tower
        if path[0] == "projector":
            return not model_args.freeze_projector
        # lm subtree
        if model_args.freeze_lm_model:
            # embeddings handled by the row mask; everything else frozen
            return "embed_tokens" in path and model_args.tune_im_start_end
        return True

    row_mask = None
    if model_args.freeze_lm_model and model_args.tune_im_start_end:
        row_mask = np.zeros((cfg.lm.vocab_size,), np.float32)
        row_mask[orig_vocab:] = 1.0
        # tokenizers that place the new tokens at low ids (TinyTokenizer)
        for tid in (cfg.image_patch_id, cfg.im_start_id, cfg.im_end_id):
            if 0 <= tid < cfg.lm.vocab_size:
                row_mask[tid] = 1.0
    return trainable, row_mask


def init_or_load_params(bundle: ModelBundle, *, rng: Optional[jax.Array] = None,
                        lm_checkpoint: Optional[str] = None,
                        vision_checkpoint: Optional[str] = None,
                        composite_checkpoint: Optional[str] = None,
                        family: str = "llama") -> Dict[str, Any]:
    """Materialize params: random init, then overwrite subtrees from
    checkpoints when given.

    ``composite_checkpoint`` is a full MMGPT save: the LM plus
    ``model.vision_tower.*`` / ``model.projector.*`` prefixed weights
    (reference composite re-extraction).
    """
    cfg = bundle.config
    rng = rng if rng is not None else jax.random.key(0)
    sample_ids = jnp.zeros((1, 8), jnp.int32)
    sample_images = jnp.zeros(
        (1, 1, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r: bundle.model.init(r, sample_ids, images=sample_images), rng)
    # materialize real random params (eval_shape above validates structure)
    variables = bundle.model.init(rng, sample_ids, images=sample_images)
    params = nn.unbox(variables["params"])

    if composite_checkpoint or lm_checkpoint or vision_checkpoint:
        from merlin_tpu.models.convert import (
            decoder_params_from_hf, extract_by_prefix, load_torch_state_dict)
        from merlin_tpu.models.vit import vit_params_from_hf

        def to_lm_tree(lm_params):
            """Checkpoints convert into the loop layout; stack on the
            HOST for scan_layers models (a device-side stack would hold
            2x the model transiently — 27 GB at 7B)."""
            if cfg.lm.scan_layers:
                from merlin_tpu.models.convert import stack_layer_params
                return stack_layer_params(lm_params, cfg.lm.num_layers)
            return lm_params

        if composite_checkpoint:
            sd = load_torch_state_dict(composite_checkpoint)
            lm_sd = {k: v for k, v in sd.items()
                     if not k.startswith(("model.vision_tower",
                                          "model.projector"))}
            params["lm"] = to_lm_tree(
                decoder_params_from_hf(lm_sd, cfg.lm, family=family))
            tower_sd = extract_by_prefix(sd, "model.vision_tower.")
            if tower_sd:
                params["vision_tower"] = {"vit": vit_params_from_hf(tower_sd, cfg.vit)}
            proj_sd = extract_by_prefix(sd, "model.projector.")
            if proj_sd:
                params["projector"] = _projector_params_from_torch(
                    proj_sd, cfg)
        else:
            if lm_checkpoint:
                sd = load_torch_state_dict(lm_checkpoint)
                lm_params = decoder_params_from_hf(sd, cfg.lm, family=family)
                emb = lm_params["embed_tokens"]["embedding"]
                lm_params["embed_tokens"]["embedding"] = (
                    resize_embeddings_mean_init(emb, cfg.lm.vocab_size))
                if not cfg.lm.tie_word_embeddings and "lm_head" in lm_params:
                    w = lm_params["lm_head"]["kernel"]
                    lm_params["lm_head"]["kernel"] = resize_embeddings_mean_init(
                        w.T, cfg.lm.vocab_size).T
                if "lm_head_kernel" in lm_params:
                    # NormHead (Baichuan2) keeps its head as a bare (H, V)
                    # kernel; new special-token columns mean-init like rows
                    w = lm_params["lm_head_kernel"]
                    lm_params["lm_head_kernel"] = resize_embeddings_mean_init(
                        w.T, cfg.lm.vocab_size).T
                params["lm"] = to_lm_tree(lm_params)
            if vision_checkpoint:
                sd = load_torch_state_dict(vision_checkpoint)
                params["vision_tower"] = {"vit": vit_params_from_hf(sd, cfg.vit)}

    params = jax.tree.map(jnp.asarray, params)
    bundle.params = params
    return params


def _projector_params_from_torch(sd: Dict[str, np.ndarray],
                                 cfg: MMGPTConfig) -> Dict[str, Any]:
    """Map reference projector state dicts to flax projector params.

    Covers every projector kind the reference prefix-loads from composite
    checkpoints (base_projector.py:12-48): conv/mlp, the bare-matmul QWen
    projector (qwen_projector.py:15), the SAM conv stack
    (sam_projector.py:12-38), and the QWenSampler Resampler
    (qwen_sampler_projector.py:22-31, keys attn_pool.* + ln_post + proj).
    """
    from merlin_tpu.models.convert import _np

    sd = {k: _np(v) for k, v in sd.items()}
    if cfg.projector == "conv":
        return {"conv": {"kernel": sd["conv.weight"].transpose(2, 3, 1, 0),
                         "bias": sd["conv.bias"]}}
    if cfg.projector in ("mlp", "linear"):
        return {"proj": {"kernel": sd["projector.weight"].T
                         if "projector.weight" in sd else sd["proj.weight"].T,
                         "bias": sd.get("projector.bias", sd.get("proj.bias"))}}
    if cfg.projector == "qwen":
        # reference: self.projector = nn.Parameter (vision_hidden, lm_hidden)
        # applied as feature @ projector — same orientation as our param
        return {"proj": sd["projector"]}
    if cfg.projector == "sam":
        # nn.Sequential of two bias-free convs ("projector.0/1.weight",
        # torch (out,in,kh,kw) -> flax (kh,kw,in,out)) + "mlp" linear
        return {
            "conv1": {"kernel": sd["projector.0.weight"].transpose(2, 3, 1, 0)},
            "conv2": {"kernel": sd["projector.1.weight"].transpose(2, 3, 1, 0)},
            "proj": {"kernel": sd["mlp.weight"].T, "bias": sd["mlp.bias"]},
        }
    if cfg.projector in ("qwen_sampler", "resampler"):
        from merlin_tpu.models.projectors import (
            default_resampler_heads, resampler_params_from_torch)

        # attention width from the packed in_proj (3E, E); heads per the
        # reference formula (must match build_projector's choice)
        key = ("attn_pool.attn.in_proj_weight"
               if "attn_pool.attn.in_proj_weight" in sd
               else "attn.in_proj_weight")
        dim = sd[key].shape[1]
        return resampler_params_from_torch(
            sd, dim=dim, num_heads=default_resampler_heads(dim))
    raise NotImplementedError(
        f"torch import for projector {cfg.projector!r} not implemented")


def quantize_bundle_lm_int8(bundle: ModelBundle) -> ModelBundle:
    """Serving-time weight-only quantization of the LM half of a bundle.

    Rebuilds the model with ``weight_dtype='int8'`` on the decoder and
    converts its kernels to int8 + per-output-channel scales (halving the
    HBM reads that bound the decode step). The tower/projector stay full
    precision (prefill-only, compute-bound). Returns a NEW bundle;
    requires initialized/loaded params.
    """
    import dataclasses as _dc

    from merlin_tpu.models.convert import quantize_decoder_params_int8

    assert bundle.params is not None, "load params before quantizing"
    lm_cfg = _dc.replace(bundle.config.lm, weight_dtype="int8")
    cfg = _dc.replace(bundle.config, lm=lm_cfg)
    params = dict(bundle.params)
    # donate: the source kernels free as their int8 replacements land —
    # at 7B both trees cannot coexist on a 16 GB chip. The INPUT bundle's
    # LM params are consumed.
    params["lm"] = quantize_decoder_params_int8(params["lm"], donate=True)
    return _dc.replace(bundle, model=MMGPT(cfg), config=cfg, params=params)
