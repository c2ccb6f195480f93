from worldforge_tpu.runtime.streaming import (StreamingExecutor,
                                              stream_layers, to_host_blocks)

__all__ = ["StreamingExecutor", "stream_layers", "to_host_blocks"]
