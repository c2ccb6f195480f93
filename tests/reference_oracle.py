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
        import enum

        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            """Minimal stand-in: register_to_config stores kwargs on
            self.config with attribute access (the reference scheduler only
            reads config attributes)."""

        class _Config(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

        def register_to_config(init):
            import functools
            import inspect

            sig = inspect.signature(init)

            @functools.wraps(init)
            def wrapper(self, *args, **kwargs):
                bound = sig.bind(self, *args, **kwargs)
                bound.apply_defaults()
                cfg = {k: v for k, v in bound.arguments.items()
                       if k != "self"}
                self._internal_config = _Config(cfg)
                type(self).config = property(
                    lambda s: s._internal_config)
                return init(self, *args, **kwargs)

            return wrapper

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config

        mu = types.ModuleType("diffusers.models.modeling_utils")
        mu.ModelMixin = torch.nn.Module
        models = types.ModuleType("diffusers.models")
        models.modeling_utils = mu

        du = types.ModuleType("diffusers.utils")

        def deprecate(*a, **k):
            return None

        class BaseOutput:
            def __init__(self, **kwargs):
                for k, v in kwargs.items():
                    setattr(self, k, v)

            def __init_subclass__(cls, **kw):
                # dataclass-decorated subclasses work as-is
                super().__init_subclass__(**kw)

        class _Logging:
            @staticmethod
            def get_logger(name=None):
                import logging as _l
                return _l.getLogger(name or "diffusers")

        du.deprecate = deprecate
        du.is_scipy_available = lambda: True
        du.BaseOutput = BaseOutput
        du.logging = _Logging()

        su = types.ModuleType("diffusers.schedulers.scheduling_utils")

        class SchedulerMixin:
            pass

        class KarrasDiffusionSchedulers(enum.Enum):
            DDIMScheduler = 1

        class SchedulerOutput:
            def __init__(self, prev_sample=None):
                self.prev_sample = prev_sample

        su.SchedulerMixin = SchedulerMixin
        su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
        su.SchedulerOutput = SchedulerOutput
        schedulers = types.ModuleType("diffusers.schedulers")
        schedulers.scheduling_utils = su

        tu = types.ModuleType("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            return torch.randn(shape, generator=generator, dtype=dtype)

        tu.randn_tensor = randn_tensor
        du.torch_utils = tu

        diff.configuration_utils = cu
        diff.models = models
        diff.utils = du
        diff.schedulers = schedulers
        sys.modules["diffusers"] = diff
        sys.modules["diffusers.configuration_utils"] = cu
        sys.modules["diffusers.models"] = models
        sys.modules["diffusers.models.modeling_utils"] = mu
        sys.modules["diffusers.utils"] = du
        sys.modules["diffusers.utils.torch_utils"] = tu
        sys.modules["diffusers.schedulers"] = schedulers
        sys.modules["diffusers.schedulers.scheduling_utils"] = su


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


def import_wan_scheduler():
    """Import the reference UniPC scheduler module (torch CPU)."""
    _patch_cuda_autocast()
    _install_stubs()
    base = "/root/reference/wan_for_worldforge"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    if "utils" in sys.modules and not getattr(
            sys.modules["utils"], "__wan_ref__", False):
        del sys.modules["utils"]
    pkg = types.ModuleType("utils")
    pkg.__path__ = [f"{base}/utils"]
    pkg.__wan_ref__ = True
    sys.modules["utils"] = pkg
    return importlib.import_module("utils.scheduling_unipc_multistep_clean")


def import_vggt_track():
    """Import the reference CoTracker-style track predictor (torch CPU):
    vggt/vggt/heads/track_modules/base_track_predictor.py."""
    base = "/root/reference/vggt"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (
            ("vggt", f"{base}/vggt"),
            ("vggt.heads", f"{base}/vggt/heads"),
            ("vggt.heads.track_modules", f"{base}/vggt/heads/track_modules")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module(
        "vggt.heads.track_modules.base_track_predictor")


def _install_triton_stub():
    """Decorator-level triton stub so the reference's Triton kernel files
    import (their kernels are never executed in oracle tests)."""
    if "triton" in sys.modules:
        return
    import importlib.abc
    import importlib.machinery

    class _AnyMeta(type):
        """_Any is a TYPE (torch does isinstance checks against triton
        classes) that also works as a decorator and attribute chain."""

        def __getattr__(cls, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return cls

        def __call__(cls, *a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]            # decorator usage (triton.jit)
            return super().__call__()

    class _Any(metaclass=_AnyMeta):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Any

        def __call__(self, *a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]
            return self

        def __iter__(self):
            return iter(())

    class _Permissive(types.ModuleType):
        """Module whose every attribute resolves to the permissive type."""

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Any

    class _TritonFinder(importlib.abc.MetaPathFinder,
                        importlib.abc.Loader):
        def find_spec(self, fullname, path=None, target=None):
            if fullname == "triton" or fullname.startswith("triton."):
                return importlib.machinery.ModuleSpec(fullname, self,
                                                      is_package=True)
            return None

        def create_module(self, spec):
            m = _Permissive(spec.name)
            m.__path__ = []
            return m

        def exec_module(self, module):
            module.__version__ = "3.0.0"   # torch checks triton.__version__

    sys.meta_path.insert(0, _TritonFinder())


def _install_xformers_stub():
    """xformers.memory_efficient_attention via torch SDPA (supports the
    BlockDiagonalMask varlen path used by LongCat cross-attention)."""
    if "xformers" in sys.modules:
        return
    import torch

    xf = types.ModuleType("xformers")
    ops = types.ModuleType("xformers.ops")
    fmha = types.ModuleType("xformers.ops.fmha")
    ab = types.ModuleType("xformers.ops.fmha.attn_bias")

    class BlockDiagonalMask:
        def __init__(self, q_lens, k_lens):
            self.q_lens = list(q_lens)
            self.k_lens = list(k_lens)

        @classmethod
        def from_seqlens(cls, q_lens, k_lens=None):
            return cls(q_lens, k_lens if k_lens is not None else q_lens)

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        # q/k/v: [B, M, H, K]
        def sdpa(q_, k_, v_):
            return torch.nn.functional.scaled_dot_product_attention(
                q_.transpose(1, 2).float(), k_.transpose(1, 2).float(),
                v_.transpose(1, 2).float()).transpose(1, 2).to(q.dtype)

        if attn_bias is None:
            return sdpa(q, k, v)
        outs = []
        qo = ko = 0
        for ql, kl in zip(attn_bias.q_lens, attn_bias.k_lens):
            outs.append(sdpa(q[:, qo:qo + ql], k[:, ko:ko + kl],
                             v[:, ko:ko + kl]))
            qo += ql
            ko += kl
        return torch.cat(outs, dim=1)

    ops.memory_efficient_attention = memory_efficient_attention
    ab.BlockDiagonalMask = BlockDiagonalMask
    fmha.attn_bias = ab
    ops.fmha = fmha
    xf.ops = ops
    sys.modules["xformers"] = xf
    sys.modules["xformers.ops"] = ops
    sys.modules["xformers.ops.fmha"] = fmha
    sys.modules["xformers.ops.fmha.attn_bias"] = ab


def import_longcat_dit():
    """Import the reference LongCat DiT (torch CPU; triton/xformers
    stubbed — attention runs through the SDPA-backed xformers stub)."""
    _patch_cuda_autocast()
    _install_stubs()
    _install_triton_stub()
    _install_xformers_stub()
    base = "/root/reference/longcat_for_worldforge"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (
            ("longcat_video", f"{base}/longcat_video"),
            ("longcat_video.modules", f"{base}/longcat_video/modules")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module("longcat_video.modules.longcat_video_dit")


def import_vggsfm_tracker():
    """Import the reference VGGSfM TrackerPredictor (torch CPU; hydra and
    omegaconf are stubbed — only used for config plumbing the default
    constructor bypasses)."""
    _patch_cuda_autocast()
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hu = types.ModuleType("hydra.utils")
        hu.instantiate = lambda *a, **k: None
        hydra.utils = hu
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hu
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class OmegaConf:
            pass

        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc
    base = "/root/reference/vggt"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (
            ("vggt", f"{base}/vggt"),
            ("vggt.dependency", f"{base}/vggt/dependency"),
            ("vggt.dependency.track_modules",
             f"{base}/vggt/dependency/track_modules")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module("vggt.dependency.vggsfm_tracker")


def import_vggt_dependency():
    """Import the reference SfM math modules (torch CPU):
    vggt/vggt/dependency/{distortion,projection}.py."""
    _patch_cuda_autocast()
    base = "/root/reference/vggt"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (("vggt", f"{base}/vggt"),
                       ("vggt.dependency", f"{base}/vggt/dependency")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    dist = importlib.import_module("vggt.dependency.distortion")
    proj = importlib.import_module("vggt.dependency.projection")
    return dist, proj


def import_fm_solvers():
    """Import the reference vendored flow DPM-Solver module (torch CPU):
    wan/utils/fm_solvers.py."""
    _patch_cuda_autocast()
    _install_stubs()
    base = "/root/reference/wan_for_worldforge"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (("wan", f"{base}/wan"),
                       ("wan.utils", f"{base}/wan/utils")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module("wan.utils.fm_solvers")


def import_longcat_scheduler():
    """Import the reference LongCat flow-match scheduler (torch CPU)."""
    _patch_cuda_autocast()
    _install_stubs()
    base = "/root/reference/longcat_for_worldforge"
    if base not in sys.path:
        sys.path.insert(0, base)
    import importlib

    for name, path in (
            ("longcat_video", f"{base}/longcat_video"),
            ("longcat_video.modules", f"{base}/longcat_video/modules")):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return importlib.import_module(
        "longcat_video.modules.scheduling_flow_match_euler_discrete")


def import_avatar_dit():
    """Import the reference avatar DiT (torch CPU; same stub set as
    import_longcat_dit plus the avatar subpackage)."""
    import importlib

    import_longcat_dit()  # installs stubs + longcat_video package paths
    base = "/root/reference/longcat_for_worldforge"
    name = "longcat_video.modules.avatar"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [f"{base}/longcat_video/modules/avatar"]
        sys.modules[name] = pkg
    # audio_process/torch_utils.py top-level imports (only
    # get_attn_map_with_target is actually used by the avatar attention)
    import importlib.machinery
    for mod in ("librosa", "pyloudnorm", "torchvision",
                "torchvision.transforms", "audio_separator",
                "audio_separator.separator"):
        if mod not in sys.modules:
            m = types.ModuleType(mod)
            # a real ModuleSpec so importlib.util.find_spec (e.g.
            # transformers' availability probes) doesn't choke on the stub
            m.__spec__ = importlib.machinery.ModuleSpec(mod, loader=None)
            sys.modules[mod] = m
    # avatar/blocks.py does `from diffusers import ConfigMixin, ModelMixin`
    diff = sys.modules["diffusers"]
    if not hasattr(diff, "ConfigMixin"):
        diff.ConfigMixin = sys.modules[
            "diffusers.configuration_utils"].ConfigMixin
        diff.ModelMixin = sys.modules[
            "diffusers.models.modeling_utils"].ModelMixin
    return importlib.import_module(
        "longcat_video.modules.avatar.longcat_video_dit_avatar")


def import_utils_warp():
    """Import the reference VGGT warp core (pure numpy/cv2/scipy + a torch
    type-check, /root/reference/vggt/modules/utils_warp.py) by file path for
    use as the warp-mask parity oracle."""
    import importlib.util

    name = "_ref_utils_warp"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/vggt/modules/utils_warp.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_dc_utils():
    """Import the reference DepthCrafter utils (trajectories, edge filter,
    and the numpy CPU renderer project_points_to_image_numpy; the pytorch3d
    import at the top is inside try/except so the module loads without it)."""
    import importlib.util

    name = "_ref_dc_utils"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/DepthCrafter/utils.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
