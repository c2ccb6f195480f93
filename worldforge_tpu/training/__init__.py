from worldforge_tpu.training.step import (flow_match_loss, longcat_forward,
                                          make_train_step)

__all__ = ["flow_match_loss", "longcat_forward", "make_train_step"]
