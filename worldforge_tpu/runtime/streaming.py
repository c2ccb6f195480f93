"""Layer-streaming executor: run models larger than HBM by prefetching
layer weights from host memory while the previous layer computes.

No direct reference counterpart — the reference relies on multi-GPU FSDP
or diffusers CPU offload (image2video.py:223-238, warp_depthcrafter.py:
54-60, sequential `.cpu()` swaps that SERIALIZE transfer and compute).
The TPU-native version overlaps them: `jax.device_put` is async, so
dispatching layer i+1's H2D copy before launching layer i's compute keeps
the DMA engines busy under the MXU work. With double buffering only
`prefetch+1` layers live in HBM (~2 x 350 MB for Wan-14B bf16 layers
instead of 28 GB).

Throughput model: layer compute ~166 ms (measured, 480p) vs layer weight
~350 MB; the stream breaks even at ~2.1 GB/s H2D — below PCIe/host rates
on real TPU hosts, so streaming is compute-bound there. Through this
environment's network tunnel (~0.02 GB/s) it is transfer-bound and only
demonstrates mechanism, which tests cover at tiny scale.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import numpy as np


def _layer_slice(host_blocks, i: int):
    """Stacked host pytree [L, ...] -> layer-i pytree (numpy view, no
    copy)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[i], host_blocks)


def _delete_tree(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            leaf.delete()


class StreamingExecutor:
    """Executes `carry = layer_fn(layer_params, carry)` over L layers whose
    parameters live in host memory, keeping at most `prefetch + 1` layers
    resident on the device.

    layer_fn is jitted once (all layers share shapes); device_put for the
    next layers is dispatched BEFORE the current layer's compute so the
    copy overlaps the matmuls.
    """

    def __init__(self, host_blocks, num_layers: int,
                 layer_fn: Callable[[Any, Any], Any], *,
                 prefetch: int = 1, device=None):
        self.host_blocks = host_blocks
        self.num_layers = num_layers
        self.layer_fn = jax.jit(layer_fn)
        self.prefetch = max(0, prefetch)
        self.device = device or jax.devices()[0]

    def _put(self, i: int):
        return jax.device_put(_layer_slice(self.host_blocks, i), self.device)

    def __call__(self, carry):
        window: List[Any] = [self._put(i)
                             for i in range(min(self.prefetch + 1,
                                                self.num_layers))]
        for i in range(self.num_layers):
            nxt = i + self.prefetch + 1
            if nxt < self.num_layers:
                window.append(self._put(nxt))   # async H2D under compute
            layer = window.pop(0)
            carry = self.layer_fn(layer, carry)
            _delete_tree(layer)
        return carry


def stream_layers(host_blocks, num_layers: int,
                  layer_fn: Callable[[Any, Any], Any], carry, *,
                  prefetch: int = 1, device=None):
    """One-shot convenience wrapper around StreamingExecutor."""
    return StreamingExecutor(host_blocks, num_layers, layer_fn,
                             prefetch=prefetch, device=device)(carry)


def to_host_blocks(blocks) -> Any:
    """Move a stacked [L, ...] device pytree to pinned host numpy (for
    building a streaming model from converted checkpoints)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), blocks)
