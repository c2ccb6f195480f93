from worldforge_tpu.ops.attention import attention, sdpa_reference
