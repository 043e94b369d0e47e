"""Unified causal-decoder LM covering every reference model family.

The reference vendors five near-identical HF-style decoder implementations
(mmgpt/utils/baichuan_7b, baichuan_13b, baichuan2_7b, baichuan2_13b, phi2 —
SURVEY.md §2.5) plus HF Llama and OPT. TPU-first redesign: ONE decoder
parameterized by :class:`DecoderConfig` feature flags, so every family is a
config, not a code fork, and XLA compiles one graph family:

  family        | positional | norm | mlp      | block    | head
  --------------|-----------|------|----------|----------|---------------
  llama/vicuna  | rope      | rms  | gated    | serial   | plain
  baichuan-7b   | rope      | rms  | gated    | serial   | plain
  baichuan-13b  | alibi     | rms  | gated    | serial   | plain
  baichuan2-7b  | rope      | rms  | gated    | serial   | NormHead+zloss
  baichuan2-13b | alibi     | rms  | gated    | serial   | NormHead+zloss
  phi-2         | rope(0.4) | ln   | gelu_new | parallel | bias, tied-no
  opt           | learned   | ln   | relu     | serial   | tied

Attention runs through :mod:`merlin_tpu.ops.attention` (Pallas flash on TPU).
KV cache is an explicit functional pytree (see :func:`init_kv_cache`): the
cache stores per-position segment/validity ids, so ragged right-padded
prompts decode correctly with a single shared write index.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from merlin_tpu.models.layers import (
    DenseGeneral,
    Embed,
    GatedMLP,
    LayerNorm,
    RMSNorm,
    SimpleMLP,
    alibi_slopes,
    apply_rope,
)
from merlin_tpu.ops.attention import attention as flash_or_xla_attention
from merlin_tpu.ops.attention import mha_reference


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None     # None -> MHA
    head_dim: Optional[int] = None         # None -> hidden/heads
    max_position_embeddings: int = 2048

    positional: str = "rope"               # rope | alibi | learned
    rope_theta: float = 10000.0
    rope_linear_scale: float = 1.0         # position interpolation (ctx stretch)
    partial_rotary_factor: float = 1.0     # phi-2: 0.4
    attention_bias: bool = False           # phi-2/opt: True

    norm: str = "rms"                      # rms | ln
    norm_eps: float = 1e-6
    mlp: str = "gated"                     # gated | gelu_new | relu
    parallel_block: bool = False           # phi-2: attn+mlp share the residual
    final_norm: bool = True

    tie_word_embeddings: bool = False
    lm_head_bias: bool = False             # phi-2: True
    normhead: bool = False                 # baichuan2: L2-normalized lm_head
    z_loss_weight: float = 0.0             # baichuan2: logsumexp^2 penalty

    dtype: Any = jnp.bfloat16
    # 'bf16' (f32 master params cast at compute) or 'int8' (weight-only
    # per-output-channel quantized kernels for SERVING: half the HBM
    # reads on the parameter-bound decode path; build the tree with
    # convert.quantize_decoder_params_int8). Embeddings stay full
    # precision (gather-bound); requires the plain lm_head.
    weight_dtype: str = "bf16"
    # s_q>1 forwards on a PAGED cache: False = from-scratch prefill into
    # identity-mapped pages (write at position 0); True = a MULTI-TOKEN
    # window against arbitrary page tables — K/V append at each
    # sequence's current length and queries attend causally from their
    # true positions (speculative-verify windows / chunked prefill in
    # the continuous-batching engine). Params are identical either way:
    # build a second module sharing the tree via dataclasses.replace.
    paged_multi_query: bool = False
    remat: bool = False                    # gradient checkpoint each layer
    scan_layers: bool = False              # nn.scan the layer stack (train)

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def head_size(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    def norm_layer(self, name):
        if self.norm == "rms":
            return RMSNorm(eps=self.norm_eps, dtype=self.dtype, name=name)
        return LayerNorm(eps=self.norm_eps, dtype=self.dtype, name=name)


def init_kv_cache(cfg: DecoderConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, *, layout: str = "dense",
                  page_size: int = 128,
                  stacked: Optional[bool] = None) -> Dict[str, Any]:
    """Functional KV cache pytree.

    ``layout='dense'``: contiguous (b, max_len) buffers; ``seg`` carries
    validity/segment ids per cached position (0 = empty) and ``index`` is a
    shared write cursor.

    ``layout='paged'``: fixed-size pages (ops/paged_attention); the page
    tables start as the identity mapping (sequence b owns pages
    [b*pps, (b+1)*pps)) — continuous-batching engines can hand in arbitrary
    tables. ``lengths`` tracks valid tokens per sequence, so ragged decode
    needs no shared cursor. ``dtype=jnp.int8`` quantizes the pages
    (per-token-per-head absmax scales ride along as ``k/v_scales``) —
    half the cache memory and page bandwidth.

    ``stacked`` (default: ``cfg.scan_layers``): ``layers`` is ONE dict of
    arrays with a leading layer axis instead of a tuple of per-layer
    dicts. Required by the scanned decode path: the layer stack runs
    under ``lax.scan``, so every Pallas kernel inside (paged attention,
    flash prefill) is traced and compiled ONCE regardless of depth — at
    7B this turns a ~6-minute 32-instance AOT compile into one instance.
    """
    if stacked is None:
        stacked = cfg.scan_layers
    L = cfg.num_layers

    def assemble(layer_fn):
        if stacked:
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x, (L,) + x.shape), layer_fn())
        return tuple(layer_fn() for _ in range(L))

    if layout == "paged":
        pps = -(-max_len // page_size)
        total = batch * pps
        # head-packed page layout: one page = one contiguous region for
        # ALL kv heads (single-DMA pages; ops/paged_attention.py)
        packed = cfg.kv_heads * cfg.head_size

        def layer():
            out = {
                "k_pages": jnp.zeros((total, page_size, packed), dtype),
                "v_pages": jnp.zeros((total, page_size, packed), dtype),
            }
            if dtype == jnp.int8:
                # strided lane layout (head i at lane i*(128//hkv)) so
                # scale pages ride DMAs AND shard over a tensor axis
                # like the value pages (ops/paged_attention._scale_row)
                out["k_scales"] = jnp.zeros(
                    (total, page_size, 128), jnp.float32)
                out["v_scales"] = jnp.zeros(
                    (total, page_size, 128), jnp.float32)
            return out

        tables = jnp.arange(total, dtype=jnp.int32).reshape(batch, pps)
        return {
            "layers": assemble(layer),
            "page_tables": tables,
            "lengths": jnp.zeros((batch,), jnp.int32),
            "index": jnp.zeros((), jnp.int32),
        }
    layer = lambda: {
        "k": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_size), dtype),
        "v": jnp.zeros((batch, max_len, cfg.kv_heads, cfg.head_size), dtype),
    }
    return {
        "layers": assemble(layer),
        "seg": jnp.zeros((batch, max_len), jnp.int32),
        # true token position per slot (slots != positions for ragged
        # decode after padded/bucketed prefill; ALiBi needs the truth)
        "pos": jnp.zeros((batch, max_len), jnp.int32),
        "index": jnp.zeros((), jnp.int32),
    }


class Attention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, segment_ids, layer_cache, cache_aux):
        cfg = self.cfg
        h, hkv, d = cfg.num_heads, cfg.kv_heads, cfg.head_size
        bias = cfg.attention_bias
        cache_seg = (cache_aux or {}).get("seg")
        cache_index = (cache_aux or {}).get("index")

        wq8 = cfg.weight_dtype == "int8"  # weight quant (cache quant: q8)
        q = DenseGeneral((h, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=bias, dtype=cfg.dtype, weight_q8=wq8,
                         name="q_proj")(x)
        k = DenseGeneral((hkv, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=bias, dtype=cfg.dtype, weight_q8=wq8,
                         name="k_proj")(x)
        v = DenseGeneral((hkv, d), kernel_axes=("embed", "heads", "kv"),
                         use_bias=bias, dtype=cfg.dtype, weight_q8=wq8,
                         name="v_proj")(x)

        if cfg.positional == "rope":
            rotary_dim = int(d * cfg.partial_rotary_factor)
            q = apply_rope(q, positions, theta=cfg.rope_theta,
                           linear_scale=cfg.rope_linear_scale,
                           rotary_dim=rotary_dim)
            k = apply_rope(k, positions, theta=cfg.rope_theta,
                           linear_scale=cfg.rope_linear_scale,
                           rotary_dim=rotary_dim)

        slopes = alibi_slopes(h) if cfg.positional == "alibi" else None

        new_cache = None
        new_seg = None
        new_pos = None
        if layer_cache is None:
            out = flash_or_xla_attention(
                q, k, v, causal=True,
                segment_ids_q=segment_ids, segment_ids_kv=segment_ids,
                alibi_slopes=slopes)
        elif "k_pages" in layer_cache:
            from merlin_tpu.ops.paged_attention import (
                paged_attention, write_token_to_pages)

            tables = cache_aux["page_tables"]
            lengths = cache_aux["lengths"]
            kp, vp = layer_cache["k_pages"], layer_cache["v_pages"]
            # flat shared pool (scan decode): this layer's pages live at
            # rows [li*P, (li+1)*P) of (L*P, page, hkv*d); offsetting the
            # page table addresses them with zero slicing/copying
            layer_index = cache_aux.get("layer_index")
            if layer_index is not None:
                pages_per_layer = kp.shape[0] // self.cfg.num_layers
                tables = tables + layer_index * pages_per_layer
            q8 = "k_scales" in layer_cache
            ks = layer_cache.get("k_scales")
            vs = layer_cache.get("v_scales")
            s_q = q.shape[1]
            if s_q == 1:
                # MERLIN_PAGED_DECODE=xla routes through the gather+dense
                # reference: each Pallas kernel instance costs ~12s in the
                # AOT compile helper (no content dedup), so a 32-layer
                # model pays ~6 min per decode signature on the kernel
                # path. At 7B the step is parameter-read-bound (~23 ms)
                # and the attention impl changes it by ~1 ms — the XLA
                # path trades that for ~30x faster compiles. Default
                # stays on the kernels (fastest steady state).
                impl = os.environ.get("MERLIN_PAGED_DECODE", "pallas")
                use_pallas = (jax.default_backend() == "tpu"
                              and impl == "pallas")
                has_slopes = slopes is not None

                def token_step(q1, kp_, ks_, vp_, vs_, k1, v1, lens,
                               tabs, slopes_):
                    """Write one token's K/V and attend over the pages.
                    Per-head parallel — under a tensor-sharded mesh this
                    whole closure runs per head-shard via shard_map."""
                    sl = slopes_ if has_slopes else None
                    if q8:
                        from merlin_tpu.ops.paged_attention import (
                            write_token_to_pages_q8)

                        kp_, ks_, vp_, vs_ = write_token_to_pages_q8(
                            kp_, ks_, vp_, vs_, k1, v1,
                            positions=lens, page_tables=tabs)
                    else:
                        kp_, vp_ = write_token_to_pages(
                            kp_, vp_, k1, v1, positions=lens,
                            page_tables=tabs)
                    if use_pallas:
                        if q8:
                            # one DMA kernel for MHA/GQA/ALiBi: the
                            # s_q==1 case of the multi-token q8 kernel
                            # (its one-hot scale expansion is
                            # group-agnostic)
                            from merlin_tpu.ops.paged_attention import (
                                paged_attention_dma_q8)

                            step = paged_attention_dma_q8(
                                q1, kp_, ks_, vp_, vs_, lens + 1, tabs,
                                alibi_slopes=sl)
                        elif not has_slopes:
                            from merlin_tpu.ops.paged_attention import (
                                paged_attention_dma)

                            step = paged_attention_dma(
                                q1, kp_, vp_, lens + 1, tabs)
                        else:
                            step = paged_attention(
                                q1, kp_, vp_, lens + 1, tabs,
                                alibi_slopes=sl)
                    else:
                        from merlin_tpu.ops.paged_attention import (
                            dequantize_pages, paged_attention_reference)
                        kd, vd = ((dequantize_pages(kp_, ks_, d),
                                   dequantize_pages(vp_, vs_, d))
                                  if q8 else (kp_, vp_))
                        step = paged_attention_reference(
                            q1, kd, vd, lens + 1, tabs, alibi_slopes=sl)
                    return step, kp_, ks_, vp_, vs_

                # tensor-parallel serving: heads split over the mesh's
                # tensor axis; pages are head-packed (head-major lanes),
                # so a lane shard IS a head shard. Everything inside is
                # per-head parallel — no collectives.
                from merlin_tpu.core.mesh import get_global_mesh

                mesh = get_global_mesh()
                tp = mesh.shape.get("tensor", 1) if mesh is not None else 1
                # q8 scale pages use the strided lane layout (head i at
                # lane i*(128//hkv)) so lane shards == head shards; TP
                # requires hkv | 128 for the stride to stay consistent
                # between the global layout and each shard's local view
                wrap = (tp > 1 and q.shape[2] % tp == 0 and hkv % tp == 0
                        and (not q8 or 128 % hkv == 0))
                ks_in = ks if q8 else jnp.zeros((1, 1, 1), jnp.float32)
                vs_in = vs if q8 else jnp.zeros((1, 1, 1), jnp.float32)
                sl_in = (slopes if has_slopes
                         else jnp.zeros((q.shape[2],), jnp.float32))
                if wrap:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    lane = P(None, None, "tensor")
                    # q8: scale pages shard lanes with the values (the
                    # strided layout makes that a head shard); bf16:
                    # ks/vs are replicated dummies
                    scale_spec = (P(None, None, "tensor") if q8
                                  else P(None, None, None))
                    head = P(None, "tensor", None)
                    out_step, kp, ks_out, vp, vs_out = shard_map(
                        token_step, mesh=mesh,
                        in_specs=(head, lane, scale_spec, lane, scale_spec,
                                  head, head, P(None), P(None, None),
                                  P("tensor")),
                        out_specs=(head, lane, scale_spec, lane,
                                   scale_spec),
                        check_vma=False,
                    )(q[:, 0], kp, ks_in, vp, vs_in, k[:, 0], v[:, 0],
                      lengths, tables, sl_in)
                else:
                    out_step, kp, ks_out, vp, vs_out = token_step(
                        q[:, 0], kp, ks_in, vp, vs_in, k[:, 0], v[:, 0],
                        lengths, tables, sl_in)
                if q8:
                    ks, vs = ks_out, vs_out
                out = out_step[:, None]
            elif self.cfg.paged_multi_query:
                # multi-token window against ARBITRARY tables (speculative
                # verify / chunked prefill): append the window's K/V at
                # each sequence's current length, then attend causally
                # from true positions over the whole paged history.
                impl = os.environ.get("MERLIN_PAGED_DECODE", "pallas")
                use_pallas = (jax.default_backend() == "tpu"
                              and impl == "pallas")
                has_slopes = slopes is not None

                def window_step(qw, kp_, ks_, vp_, vs_, kw, vw, lens,
                                tabs, slopes_):
                    """Write an s_q window and attend over the pages.
                    Per-head parallel (shard_map'able like token_step)."""
                    sl = slopes_ if has_slopes else None
                    if q8:
                        from merlin_tpu.ops.paged_attention import (
                            write_tokens_to_pages_q8)

                        kp_, ks_, vp_, vs_ = write_tokens_to_pages_q8(
                            kp_, ks_, vp_, vs_, kw, vw,
                            start_positions=lens, page_tables=tabs)
                    else:
                        from merlin_tpu.ops.paged_attention import (
                            write_tokens_to_pages)

                        kp_, vp_ = write_tokens_to_pages(
                            kp_, vp_, kw, vw, start_positions=lens,
                            page_tables=tabs)
                    new_lens = lens + s_q
                    if use_pallas:
                        if q8:
                            from merlin_tpu.ops.paged_attention import (
                                paged_attention_dma_multi_q8)

                            step = paged_attention_dma_multi_q8(
                                qw, kp_, ks_, vp_, vs_, new_lens, tabs,
                                alibi_slopes=sl)
                        else:
                            from merlin_tpu.ops.paged_attention import (
                                paged_attention_dma_multi)

                            step = paged_attention_dma_multi(
                                qw, kp_, vp_, new_lens, tabs,
                                alibi_slopes=sl)
                    else:
                        from merlin_tpu.ops.paged_attention import (
                            dequantize_pages,
                            paged_attention_multi_reference)
                        kd, vd = ((dequantize_pages(kp_, ks_, d),
                                   dequantize_pages(vp_, vs_, d))
                                  if q8 else (kp_, vp_))
                        step = paged_attention_multi_reference(
                            qw, kd, vd, new_lens, tabs, alibi_slopes=sl)
                    return step, kp_, ks_, vp_, vs_

                from merlin_tpu.core.mesh import get_global_mesh

                mesh = get_global_mesh()
                tp = mesh.shape.get("tensor", 1) if mesh is not None else 1
                wrap = (tp > 1 and q.shape[2] % tp == 0 and hkv % tp == 0
                        and (not q8 or 128 % hkv == 0))
                ks_in = ks if q8 else jnp.zeros((1, 1, 1), jnp.float32)
                vs_in = vs if q8 else jnp.zeros((1, 1, 1), jnp.float32)
                sl_in = (slopes if has_slopes
                         else jnp.zeros((q.shape[2],), jnp.float32))
                if wrap:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    lane = P(None, None, "tensor")
                    scale_spec = (P(None, None, "tensor") if q8
                                  else P(None, None, None))
                    headw = P(None, None, "tensor", None)
                    out_step, kp, ks_out, vp, vs_out = shard_map(
                        window_step, mesh=mesh,
                        in_specs=(headw, lane, scale_spec, lane, scale_spec,
                                  headw, headw, P(None), P(None, None),
                                  P("tensor")),
                        out_specs=(headw, lane, scale_spec, lane,
                                   scale_spec),
                        check_vma=False,
                    )(q, kp, ks_in, vp, vs_in, k, v, lengths, tables, sl_in)
                else:
                    out_step, kp, ks_out, vp, vs_out = window_step(
                        q, kp, ks_in, vp, vs_in, k, v, lengths, tables,
                        sl_in)
                if q8:
                    ks, vs = ks_out, vs_out
                out = out_step
            else:
                # prefill: bulk-write the prompt into the (identity-mapped)
                # pages; attention is plain self-attention over the prompt.
                # head-packed layout: each token is one (hkv*d,) row. In
                # flat-pool mode the write lands at this layer's block via
                # a dynamic leading index (in-place on the scan carry).
                b_, s_ = k.shape[:2]
                pps = tables.shape[1]
                page = kp.shape[1]
                kt = k.reshape(b_, s_, hkv * d)
                vt = v.reshape(b_, s_, hkv * d)

                def bulk(pages, rows):
                    if layer_index is not None:
                        view = pages.reshape(
                            (self.cfg.num_layers, b_, pps * page)
                            + pages.shape[2:])
                        view = jax.lax.dynamic_update_slice(
                            view, rows[None].astype(pages.dtype),
                            (layer_index, 0, 0) + (0,) * (rows.ndim - 2))
                        return view.reshape(pages.shape)
                    view = pages.reshape(
                        (b_, pps * page) + pages.shape[2:])
                    view = jax.lax.dynamic_update_slice(
                        view, rows.astype(pages.dtype),
                        (0, 0) + (0,) * (rows.ndim - 2))
                    return view.reshape(pages.shape)

                if q8:
                    from merlin_tpu.ops.paged_attention import quantize_pages

                    ktq, ksq = quantize_pages(kt, d)
                    vtq, vsq = quantize_pages(vt, d)
                    kp, ks = bulk(kp, ktq), bulk(ks, ksq)
                    vp, vs = bulk(vp, vtq), bulk(vs, vsq)
                else:
                    kp = bulk(kp, kt)
                    vp = bulk(vp, vt)
                out = flash_or_xla_attention(
                    q, k, v, causal=True,
                    segment_ids_q=segment_ids, segment_ids_kv=segment_ids,
                    alibi_slopes=slopes)
            new_cache = {"k_pages": kp, "v_pages": vp}
            if q8:
                new_cache["k_scales"] = ks
                new_cache["v_scales"] = vs
        else:
            # Write this step's K/V (and validity) into the cache at `index`.
            idx = cache_index
            li = (cache_aux or {}).get("layer_index")
            if li is not None:
                # scan decode: the stacked (L, b, len, hkv, d) buffers are
                # carried whole; update this layer's slice (in-place DUS
                # on the scan carry) and read it back for attention
                def upd(full, new):
                    return jax.lax.dynamic_update_slice(
                        full, new[None].astype(full.dtype),
                        (li, 0, idx, 0, 0))
                kc_full = upd(layer_cache["k"], k)
                vc_full = upd(layer_cache["v"], v)
                new_cache = {"k": kc_full, "v": vc_full}
                kc = jax.lax.dynamic_index_in_dim(kc_full, li, 0,
                                                  keepdims=False)
                vc = jax.lax.dynamic_index_in_dim(vc_full, li, 0,
                                                  keepdims=False)
            else:
                kc = jax.lax.dynamic_update_slice_in_dim(
                    layer_cache["k"], k.astype(layer_cache["k"].dtype),
                    idx, axis=1)
                vc = jax.lax.dynamic_update_slice_in_dim(
                    layer_cache["v"], v.astype(layer_cache["v"].dtype),
                    idx, axis=1)
                new_cache = {"k": kc, "v": vc}
            seg_in = (segment_ids if segment_ids is not None
                      else jnp.ones(q.shape[:2], jnp.int32))
            new_seg = jax.lax.dynamic_update_slice_in_dim(
                cache_seg, seg_in, idx, axis=1)
            new_pos = jax.lax.dynamic_update_slice_in_dim(
                cache_aux["pos"], positions.astype(jnp.int32), idx, axis=1)
            s_q = q.shape[1]
            if s_q == 1:
                # Single decode step: every valid cached token is in the past;
                # the validity mask alone is the attention mask. ALiBi needs
                # TRUE positions on both sides: cache slots differ from token
                # positions once prompts are padded/bucketed, so the cache
                # tracks per-slot positions ("pos").
                out = mha_reference(
                    q, kc, vc, causal=False,
                    segment_ids_q=jnp.ones((q.shape[0], 1), jnp.int32),
                    segment_ids_kv=(new_seg > 0).astype(jnp.int32),
                    alibi_slopes=slopes, q_offset=positions,
                    k_positions=new_pos)
            else:
                # Prefill: causal within the written span.
                out = mha_reference(
                    q, kc, vc, causal=True,
                    segment_ids_q=seg_in,
                    segment_ids_kv=new_seg,
                    alibi_slopes=slopes, q_offset=idx)

        out = DenseGeneral((cfg.hidden_size,), axis=(-2, -1),
                           kernel_axes=("heads", "kv", "embed"),
                           use_bias=bias, dtype=cfg.dtype,
                           weight_q8=cfg.weight_dtype == "int8",
                           name="o_proj")(out)
        new_aux = None
        if new_seg is not None:
            new_aux = {"seg": new_seg, "pos": new_pos}
        return out, new_cache, new_aux


class DecoderBlock(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, segment_ids, layer_cache, cache_aux):
        cfg = self.cfg
        h = cfg.norm_layer("input_norm")(x)
        attn_out, new_cache, new_aux = Attention(cfg, name="attn")(
            h, positions, segment_ids, layer_cache, cache_aux)

        if cfg.mlp == "gated":
            mlp = GatedMLP(cfg.intermediate_size, dtype=cfg.dtype,
                           weight_q8=cfg.weight_dtype == "int8", name="mlp")
        else:
            mlp = SimpleMLP(cfg.intermediate_size, activation=cfg.mlp,
                            dtype=cfg.dtype,
                            weight_q8=cfg.weight_dtype == "int8", name="mlp")

        if cfg.parallel_block:
            # Phi-2: attention and MLP read the same normed input and share
            # one residual add.
            x = x + attn_out + mlp(h)
        else:
            x = x + attn_out
            h2 = cfg.norm_layer("post_attn_norm")(x)
            x = x + mlp(h2)
        return x, new_cache, new_aux


class _BlockForScan(nn.Module):
    """DecoderBlock adapted to nn.scan's (carry, ...) -> (carry, out)
    calling convention.

    Cache modes, decided at trace time by the carry structure:
      * training — no cache at all (pool=None),
      * decode/prefill — the WHOLE stacked cache rides the CARRY and
        each layer addresses its slice by ``layer_index``: paged caches
        as flat (L*pages, page, hkv*d) arrays via a page-table offset,
        dense caches via a dynamic leading index. Carried buffers update
        in place under lax.scan; scanning the cache as xs/ys instead
        costs a full cache copy per layer per step (measured ~6 ms on
        the 7B paged serving step).
    """

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, carry, positions, segment_ids, cache_aux, layer_idx):
        x, pool = carry
        if pool is not None:
            aux = dict(cache_aux, layer_index=layer_idx)
            x, new_pool, _ = DecoderBlock(self.cfg, name="block")(
                x, positions, segment_ids, pool, aux)
            return (x, new_pool), None
        x, _, _ = DecoderBlock(self.cfg, name="block")(
            x, positions, segment_ids, None, cache_aux)
        return (x, None), None


class CausalLM(nn.Module):
    """Token ids (or pre-spliced embeddings) -> logits (+ updated KV cache)."""

    cfg: DecoderConfig

    def setup(self):
        cfg = self.cfg
        if cfg.weight_dtype == "int8":
            # tied-embedding heads read the f32 embedding (attend path);
            # NormHead renormalizes its kernel every forward, which a
            # static per-channel scale cannot represent
            assert not cfg.normhead, (
                "int8 weight-only serving: NormHead renormalizes per "
                "forward and stays full precision")
        self.embed_tokens = Embed(cfg.vocab_size, cfg.hidden_size,
                                  dtype=cfg.dtype, name="embed_tokens")
        if cfg.positional == "learned":
            # OPT-style learned positions (offset 2 handled by caller parity
            # code in convert.py; positions here are already final indices).
            self.embed_positions = Embed(
                cfg.max_position_embeddings + 2, cfg.hidden_size,
                dtype=cfg.dtype, name="embed_positions")
        if cfg.scan_layers:
            # ONE scanned block with params stacked along a leading
            # "layers" axis: every attention/MLP (and any Pallas kernel
            # inside) is traced and compiled ONCE regardless of depth.
            # Measured on this env's AOT helper, each Pallas kernel
            # instance costs ~12 s to compile, so a 32-layer graph saves
            # minutes per jit signature. Decode scans too: a STACKED KV
            # cache (init_kv_cache(stacked=True)) rides the scan axis, so
            # 7B paged serving compiles one paged-attention instance
            # instead of 32 (use convert.stack_layer_params to serve a
            # loop-trained checkpoint with the scan decoder and vice
            # versa).
            wrapped = _BlockForScan
            if cfg.remat:
                wrapped = nn.remat(
                    _BlockForScan, prevent_cse=False,
                    policy=jax.checkpoint_policies.nothing_saveable)
            self.blocks_scanned = nn.scan(
                wrapped,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, 0),
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name="layers")
            self.blocks = []
        else:
            block = DecoderBlock
            if cfg.remat:
                block = nn.remat(
                    DecoderBlock, prevent_cse=False,
                    static_argnums=(),
                    policy=jax.checkpoint_policies.nothing_saveable)
            self.blocks = [block(cfg, name=f"layers_{i}")
                           for i in range(cfg.num_layers)]
        if cfg.final_norm:
            self.final_norm_layer = cfg.norm_layer("final_norm")
        if not cfg.tie_word_embeddings:
            if cfg.normhead:
                # Baichuan2 NormHead: plain kernel param, L2-normalized per
                # vocab column at every forward (modeling_baichuan.py:495-502
                # behavior, rebuilt).
                self.lm_head_kernel = self.param(
                    "lm_head_kernel",
                    nn.with_logical_partitioning(
                        nn.initializers.lecun_normal(), ("embed", "vocab")),
                    (cfg.hidden_size, cfg.vocab_size), jnp.float32)
            else:
                self.lm_head = DenseGeneral(
                    (cfg.vocab_size,), kernel_axes=("embed", "vocab"),
                    use_bias=cfg.lm_head_bias, dtype=cfg.dtype,
                    weight_q8=cfg.weight_dtype == "int8", name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def compute_logits(self, hidden):
        cfg = self.cfg
        if cfg.tie_word_embeddings:
            return self.embed_tokens.attend(hidden)
        if cfg.normhead:
            kernel = self.lm_head_kernel
            kernel = kernel / (jnp.linalg.norm(kernel, axis=0, keepdims=True) + 1e-7)
            return jax.lax.dot_general(
                hidden.astype(cfg.dtype), kernel.astype(cfg.dtype),
                (((hidden.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return self.lm_head(hidden)

    def __call__(self, input_ids=None, *, inputs_embeds=None, positions=None,
                 segment_ids=None, kv_cache=None, return_hidden=False):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s = inputs_embeds.shape[:2]
        if positions is None:
            start = kv_cache["index"] if kv_cache is not None else 0
            positions = start + jnp.broadcast_to(jnp.arange(s), (b, s))
        x = inputs_embeds
        if cfg.positional == "learned":
            x = x + self.embed_positions(positions + 2)

        cache_aux = None
        if kv_cache is not None:
            cache_aux = {k_: v_ for k_, v_ in kv_cache.items()
                         if k_ != "layers"}

        if cfg.scan_layers:
            if kv_cache is not None and not isinstance(
                    kv_cache["layers"], dict):
                raise ValueError(
                    "scan_layers decode needs a STACKED KV cache "
                    "(init_kv_cache(stacked=True)): the per-layer slices "
                    "ride the scan axis")
            layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
            if kv_cache is None:
                (x, _), _ = self.blocks_scanned(
                    (x, None), positions, segment_ids, None, layer_ids)
                new_layers = None
            elif "page_tables" in kv_cache:
                # paged: flatten (L, P, ...) -> (L*P, ...) ONCE and carry
                # the whole pool; layers address their pages via table
                # offsets (see _BlockForScan)
                flat = {k_: v_.reshape((-1,) + v_.shape[2:])
                        for k_, v_ in kv_cache["layers"].items()}
                (x, flat), _ = self.blocks_scanned(
                    (x, flat), positions, segment_ids, cache_aux, layer_ids)
                L = cfg.num_layers
                new_layers = {
                    k_: v_.reshape((L, v_.shape[0] // L) + v_.shape[1:])
                    for k_, v_ in flat.items()}
            else:
                # dense: the stacked (L, b, len, hkv, d) buffers ride the
                # carry; each layer updates/reads its slice by index
                (x, new_layers), _ = self.blocks_scanned(
                    (x, kv_cache["layers"]), positions, segment_ids,
                    cache_aux, layer_ids)
        else:
            new_layers = []
            for i, blk in enumerate(self.blocks):
                layer_cache = (kv_cache["layers"][i]
                               if kv_cache is not None else None)
                x, layer_new, _ = blk(
                    x, positions, segment_ids, layer_cache, cache_aux)
                if kv_cache is not None:
                    new_layers.append(layer_new)
            new_layers = tuple(new_layers)
        if cfg.final_norm:
            x = self.final_norm_layer(x)
        logits = self.compute_logits(x)

        new_cache = None
        if kv_cache is not None:
            new_cache = {"layers": new_layers,
                         "index": kv_cache["index"] + s}
            if "page_tables" in kv_cache:
                new_cache["page_tables"] = kv_cache["page_tables"]
                if s == 1:
                    new_cache["lengths"] = kv_cache["lengths"] + 1
                elif cfg.paged_multi_query:
                    # a verify window appends s tokens; callers roll back
                    # rejected drafts by overwriting lengths afterwards
                    new_cache["lengths"] = kv_cache["lengths"] + s
                elif segment_ids is not None:
                    new_cache["lengths"] = (
                        (segment_ids > 0).sum(axis=1).astype(jnp.int32))
                else:
                    new_cache["lengths"] = jnp.full(
                        (b,), s, jnp.int32)
            else:
                # validity/position bookkeeping is layer-independent:
                # computed once here for the returned cache (every layer's
                # Attention derives the same update internally for its own
                # masking; XLA CSEs the duplicates)
                idx = kv_cache["index"]
                seg_in = (segment_ids if segment_ids is not None
                          else jnp.ones((b, s), jnp.int32))
                new_cache["seg"] = jax.lax.dynamic_update_slice_in_dim(
                    kv_cache["seg"], seg_in, idx, axis=1)
                new_cache["pos"] = jax.lax.dynamic_update_slice_in_dim(
                    kv_cache["pos"], positions.astype(jnp.int32), idx,
                    axis=1)
        if return_hidden:
            return logits, new_cache, x
        return logits, new_cache


def cross_entropy_loss(logits, labels, *, ignore_index=-100,
                       z_loss_weight=0.0):
    """Shifted-label CE in f32 with ignore masking + optional z-loss.

    logits: (b, s, V) f32; labels: (b, s) int32. Labels are already aligned
    (caller shifts). Returns (mean_loss, num_valid_tokens).
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1)[..., 0]
    nll = logz - label_logit
    if z_loss_weight:
        nll = nll + z_loss_weight * jnp.square(logz)
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count, valid.sum()
