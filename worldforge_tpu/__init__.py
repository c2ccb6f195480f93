"""worldforge_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of WorldForge.

Training-free, camera-controllable 3D/4D video generation via a
warping-and-repainting pipeline:

  warp    — depth estimation + camera-trajectory point-cloud reprojection
            (``worldforge_tpu.warp``)
  repaint — video-diffusion denoising with IRR / FLF / DSG guidance
            (``worldforge_tpu.sampling`` over ``worldforge_tpu.models``)

Reference behavior: Westlake-AGI-Lab/WorldForge (see SURVEY.md). All code here
is written TPU-first; reference files are cited in docstrings for parity
checking only.
"""

__version__ = "0.1.0"
