from worldforge_tpu.runtime.streaming import (StreamingExecutor,
                                              stream_layers, to_host_blocks)
from worldforge_tpu.runtime.subproc import (decode_in_subprocess,
                                            save_params_host)

__all__ = ["StreamingExecutor", "stream_layers", "to_host_blocks",
           "decode_in_subprocess", "save_params_host"]
