from worldforge_tpu.training.lora import (apply_lora, init_lora,
                                          make_lora_train_step)
from worldforge_tpu.training.step import (flow_match_loss, longcat_forward,
                                          make_train_step)

__all__ = ["apply_lora", "flow_match_loss", "init_lora", "longcat_forward",
           "make_lora_train_step", "make_train_step"]
