"""Import helpers for using the READ-ONLY reference torch models as
numerical oracles in tests (BASELINE.json: <=1e-2 latent drift vs
reference). Missing GPU-only deps are stubbed minimally; the reference code
itself is never modified or copied."""

import sys
import types


def _install_stubs():
    import torch

    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed

    if "ftfy" not in sys.modules:
        import importlib.machinery
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = ftfy

    if "diffusers" not in sys.modules:
        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        def register_to_config(fn):
            return fn

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        mu = types.ModuleType("diffusers.models.modeling_utils")
        mu.ModelMixin = torch.nn.Module
        models = types.ModuleType("diffusers.models")
        models.modeling_utils = mu
        diff.configuration_utils = cu
        diff.models = models
        sys.modules["diffusers"] = diff
        sys.modules["diffusers.configuration_utils"] = cu
        sys.modules["diffusers.models"] = models
        sys.modules["diffusers.models.modeling_utils"] = mu


def _patch_cuda_autocast():
    """CPU-only torch raises on cuda autocast contexts; replace with a
    dtype-preserving no-op (the reference only uses it to force fp32, and
    the whole oracle runs fp32 anyway)."""
    import contextlib
    import functools
    import torch

    class _NoopAutocast(contextlib.nullcontext):
        def __init__(self, *a, **k):
            super().__init__()

        def __call__(self, fn):
            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                return fn(*args, **kwargs)
            return wrapper

    torch.cuda.amp.autocast = _NoopAutocast


def import_wan_reference():
    """Returns (model, vae) reference modules (torch, CPU/SDPA path).

    Imports the submodules directly with stub package parents so the real
    package __init__ (which imports t5.py with an import-time
    torch.cuda.current_device() call) never runs."""
    _patch_cuda_autocast()
    _install_stubs()
    base = "/root/reference/wan_for_worldforge"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (("wan", f"{base}/wan"),
                       ("wan.modules", f"{base}/wan/modules")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg

    wan_model = importlib.import_module("wan.modules.model")
    wan_vae = importlib.import_module("wan.modules.vae")

    # WanSelfAttention calls flash_attention directly (model.py:149), which
    # asserts CUDA; substitute an fp32 SDPA equivalent for the CPU oracle.
    import torch

    def _sdpa_flash_attention(q, k, v, q_lens=None, k_lens=None,
                              window_size=(-1, -1), **kwargs):
        del q_lens, k_lens, window_size  # full lengths in oracle tests
        qt = q.transpose(1, 2).float()
        kt = k.transpose(1, 2).float()
        vt = v.transpose(1, 2).float()
        out = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        return out.transpose(1, 2).contiguous()

    wan_model.flash_attention = _sdpa_flash_attention
    return wan_model, wan_vae
