"""torch.Generator-compatible noise for latent-drift validation.

BASELINE.json requires <=1e-2 latent drift vs the reference, whose noise
comes from torch.manual_seed(42) / torch.Generator (SURVEY.md §7 hard part
2). JAX keys cannot reproduce torch's RNG stream, so drift harnesses draw
noise through torch CPU (in-image) and feed it to both sides.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class TorchCompatibleRNG:
    """Stateful wrapper over a torch CPU generator producing numpy arrays in
    the exact order the reference consumes them."""

    def __init__(self, seed: int = 42):
        import torch
        self._torch = torch
        self._gen = torch.Generator().manual_seed(seed)

    def randn(self, *shape: int, dtype=np.float32) -> np.ndarray:
        t = self._torch.randn(shape, generator=self._gen)
        return t.numpy().astype(dtype)

    def randn_like(self, x) -> np.ndarray:
        return self.randn(*np.asarray(x).shape)


def torch_randn(shape: Sequence[int], seed: int = 42) -> np.ndarray:
    """One-shot torch.manual_seed(seed)-equivalent normal draw."""
    return TorchCompatibleRNG(seed).randn(*shape)


def seed_torch_global(seed: int) -> None:
    """Seed torch's global RNG (host-side interop for transformers-backed
    generation, e.g. utils/prompt_extend.TransformersPromptExpander —
    keeps the repo's only torch imports in this module + io/torch_load)."""
    import torch  # noqa: PLC0415

    torch.manual_seed(seed % (2 ** 31))
