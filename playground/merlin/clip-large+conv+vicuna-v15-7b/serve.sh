#!/bin/bash
# Serving recipe: controller + one continuous-batching TPU worker + web UI.
# (The reference serves via FastChat-style controller/model_worker/gradio,
# engine/serve/* — this is the TPU-native stack on stdlib HTTP.)
CKPT=${CKPT:-output/merlin-sft/checkpoint-final}
CONTROLLER=${CONTROLLER:-http://localhost:21001}

python -m merlin_tpu.serve.controller --port 21001 &

# One worker per TPU host. --scan-decode compiles ONE paged-attention
# kernel instance for the whole 32-layer stack (the loop decoder pays
# ~12s of AOT compile per layer); chunk-steps 1 keeps a single pool copy
# on the chip (full-7B + KV pool fit 16GB); pipeline 8 batches token
# syncs against the host round trip; int8 KV halves pool memory ->
# 6 slots in the freed space. Optional throughput levers:
#   --int8-weights   weight-only int8 LM kernels: halves the parameter
#                    reads bounding decode (~2x the slot budget too)
#   --speculative 4  greedy-exact prompt-lookup multi-token decode for
#                    the per-request (image) path; one-chunk responses
python -m merlin_tpu.serve.worker \
    --port 21002 \
    --controller-address "$CONTROLLER" \
    --model-path lmsys/vicuna-7b-v1.5 \
    --pretrain_model "$CKPT" \
    --engine --scan-decode \
    --engine-slots 6 \
    --engine-chunk-steps 1 \
    --engine-pipeline 8 \
    --engine-cache-dtype int8 \
    --model_max_length 2048 "$@" &

python -m merlin_tpu.serve.web --port 7860 \
    --controller "$CONTROLLER"
