#!/bin/bash
# Merlin pretrain recipe on TPU (reference playground/.../pretrain.sh parity).
# The torchrun 8-GPU launch becomes a single JAX process per TPU host; the
# mesh flags replace --fsdp "shard_grad_op auto_wrap".
export MERLIN_DATA_ROOT=${MERLIN_DATA_ROOT:-/data/merlin}

python -m merlin_tpu.engine.train \
    --model_name_or_path lmsys/vicuna-7b-v1.5 \
    --vision_tower openai/clip-vit-large-patch14 \
    --projector conv --conv_stride 2 \
    --pair_datasets laion2b_10m_6merge \
    --interpair_datasets track_1m_v2_2merge+det_5m_v1_en_4merge \
    --image_size 448 --image_aspect_ratio resize \
    --model_max_length 2048 \
    --per_device_train_batch_size 1 --gradient_accumulation_steps 8 \
    --learning_rate 5e-5 --adam_beta2 0.95 --weight_decay 0.05 \
    --warmup_ratio 0.01 --lr_scheduler_type cosine \
    --llrd True --llm_llrd False \
    --bf16 True --gradient_checkpointing True \
    --mesh_data -1 --mesh_fsdp 8 --mesh_tensor 1 \
    --save_steps 500 --save_total_limit 2 --logging_steps 1 \
    --dataloader_num_workers 4 \
    --output_dir output/merlin-pretrain "$@"
