from merlin_tpu.ops.attention import attention, mha_reference
