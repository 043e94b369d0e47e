"""merlin_tpu: TPU-native multimodal LLM framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
Ahnsun/merlin (MMGPT) reference: a LLaVA-style vision-language stack
(CLIP ViT tower -> projector -> causal LM) trained on streamed tar shards
of image-text pairs, multi-frame "interpair" tracking data, interleaved
corpora and conversation SFT data; evaluated on MMBench/MMVet/DocVQA and
single-object tracking; served through a controller/worker streaming API.

Layer map (bottom -> top):
  core/      mesh + sharding (DP/FSDP/TP axes), precision policies
  ops/       Pallas kernels (flash attention w/ segment ids), image ops, sampling
  models/    flax modules: ViT towers, projectors, LM families, MMGPT composition
  data/      shard streaming, packing, box serialization, dataset families
  train/     optax + LLRD, pjit train step, orbax checkpointing, trainer loop
  generate/  jitted autoregressive decode (KV cache, greedy/sample/beam)
  eval/      benchmark harnesses + rule evaluators
  serve/     controller/worker/cli (HTTP transport)
  utils/     constants, conversation templates, logging, tokenizer wrapper
"""

__version__ = "0.1.0"


def build_model_tokenizer(*args, **kwargs):
    """Public entry (reference model/builder.py:18 signature family)."""
    from merlin_tpu.models.builder import build_model_tokenizer as f
    return f(*args, **kwargs)


def train(*args, **kwargs):
    """Public entry (reference engine/train/train.py:32)."""
    from merlin_tpu.engine.train import train as f
    return f(*args, **kwargs)
