"""ALIKED checkpoint conversion from the lightglue/ALIKED torch layout.

Source layout: the `lightglue` pip package's ALIKED module (the reference's
import at vggsfm_utils.py:15), whose state dict follows the published
ALIKED repo: block1..block4 (Conv/ResBlocks, deformable conv1/conv2 with
offset_conv + regular_conv submodules in blocks 3-4), neck conv1..conv4,
score_head.{0,2,4,6}, desc_head.{offset_conv.0, offset_conv.2, sf_conv,
convM}. lightglue is not installed in-image: the layout is frozen as a
manifest fixture and exactly roundtripped in tests/test_aliked.py (same
offline treatment as the SVD converter)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from worldforge_tpu.io.torch_load import StrictStateDict, conv_to_hwio
from worldforge_tpu.sfm.aliked import ALIKEDConfig

_ALIKED_CTX = ("expected the lightglue/ALIKED layout frozen in "
               "tests/fixtures/aliked_manifest.json")


def _c(sd, name, dtype, bias=True):
    p = {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype)}
    if bias:
        p["b"] = jnp.asarray(sd[f"{name}.bias"], dtype)
    return p


def _bn(sd, name, dtype):
    return {"scale": jnp.asarray(sd[f"{name}.weight"], dtype),
            "bias": jnp.asarray(sd[f"{name}.bias"], dtype),
            "mean": jnp.asarray(sd[f"{name}.running_mean"], dtype),
            "var": jnp.asarray(sd[f"{name}.running_var"], dtype)}


def _convlayer(sd, name, dtype):
    """A block's conv1/conv2 slot: plain 3x3 (bias=False) or a
    DeformableConv2d (offset_conv with bias + regular_conv without)."""
    if f"{name}.offset_conv.weight" in sd:
        return {"offset": _c(sd, f"{name}.offset_conv", dtype),
                "w": jnp.asarray(
                    conv_to_hwio(sd[f"{name}.regular_conv.weight"]), dtype)}
    return {"w": jnp.asarray(conv_to_hwio(sd[f"{name}.weight"]), dtype)}


def _block(sd, pre, dtype, res: bool):
    p = {"conv1": _convlayer(sd, f"{pre}.conv1", dtype),
         "bn1": _bn(sd, f"{pre}.bn1", dtype),
         "conv2": _convlayer(sd, f"{pre}.conv2", dtype),
         "bn2": _bn(sd, f"{pre}.bn2", dtype)}
    if res:
        p["downsample"] = _c(sd, f"{pre}.downsample", dtype)
    return p


def convert_aliked(sd: Dict[str, np.ndarray], cfg: ALIKEDConfig,
                   dtype=jnp.float32, strict: bool = True) -> dict:
    sd = StrictStateDict(sd, _ALIKED_CTX)
    params = {
        "block1": _block(sd, "block1", dtype, res=False),
        "block2": _block(sd, "block2", dtype, res=True),
        "block3": _block(sd, "block3", dtype, res=True),
        "block4": _block(sd, "block4", dtype, res=True),
        "conv1": _c(sd, "conv1", dtype, bias=False),
        "conv2": _c(sd, "conv2", dtype, bias=False),
        "conv3": _c(sd, "conv3", dtype, bias=False),
        "conv4": _c(sd, "conv4", dtype, bias=False),
        "score_head": {
            "0": _c(sd, "score_head.0", dtype, bias=False),
            "2": _c(sd, "score_head.2", dtype, bias=False),
            "4": _c(sd, "score_head.4", dtype, bias=False),
            "6": _c(sd, "score_head.6", dtype, bias=False)},
        "desc_head": {
            "offset_conv1": _c(sd, "desc_head.offset_conv.0", dtype),
            "offset_conv2": _c(sd, "desc_head.offset_conv.2", dtype),
            "sf_conv": _c(sd, "desc_head.sf_conv", dtype, bias=False),
            "convM": _c(sd, "desc_head.convM", dtype, bias=False)},
    }
    if strict:
        unused = sorted(set(sd.sd) - sd.used)
        if unused:
            raise ValueError(
                f"ALIKED checkpoint layout mismatch: {len(unused)} keys "
                f"never consumed (first 10: {unused[:10]})")
    return params
