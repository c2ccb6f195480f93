"""Compiler-preferred weight layouts for quantized serving.

Problem (measured on the v5e, scripts/run_e2e_guided.py round-3 OOM
post-mortem): XLA's layout assignment wants the int4 attention weight
stacks in a transposed {1,2,0} on-chip layout; with default row-major
entry layouts it materializes a u8 COPY of every such stack as an HLO
temp — 10 x 500 MB = 5 GB of pure layout copies for the Wan-14B i2v,
which is the difference between the guided DiT+VAE program fitting a
16 GB chip (12.3 GB) and not (17.3 GB).

Fix: compile with AUTO entry layouts for the weight pytree (the compiler
then keeps its preferred layout as the ENTRY layout instead of inserting
copies), read back the chosen formats, and relayout the stored weights
once — deleting each old buffer as its copy lands so the transient
overhead is one leaf, not a second model.

The reference never needs this because torch tensors have no compiler-
chosen layouts; it is the TPU/XLA-native analog of the reference's
contiguous()/channels-last weight preparation.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax

try:  # public in jax.experimental.layout; AutoLayout via the src module
    from jax.experimental.layout import Format
    from jax._src.layout import AutoLayout
    _HAVE_LAYOUTS = True
except Exception:  # pragma: no cover - older/newer jax
    _HAVE_LAYOUTS = False


def auto_layouts_supported() -> bool:
    return _HAVE_LAYOUTS


def jit_matching_layouts(fn, args: Tuple, argnums: Sequence[int] = (0,)):
    """jit ``fn`` with entry layouts pinned to the CONCRETE formats the
    selected args already carry on device. Use for a second program over
    weights that compile_auto_layouts already relaid: AUTO would error
    ('layout does not match the layout on the respective arg') and default
    layouts would re-materialize the copies the relayout removed."""
    if not _HAVE_LAYOUTS:
        return jax.jit(fn)
    in_sh = [None] * len(args)
    for i in argnums:
        in_sh[i] = jax.tree.map(lambda leaf: leaf.format, args[i])
    return jax.jit(fn, in_shardings=tuple(in_sh))


def relayout_arg(arg, fmt_tree, donate_old: bool = True):
    """Relayout one arg pytree to ``fmt_tree`` (formats as returned by
    ``compiled.input_formats``). With ``donate_old`` each original leaf
    buffer is deleted as soon as its relayouted copy is ready, bounding
    transient HBM overhead to one leaf — only safe when the caller will
    never touch the original again."""
    leaves, tree = jax.tree.flatten(arg)
    fleaves = jax.tree.leaves(fmt_tree)
    if len(leaves) != len(fleaves):
        raise ValueError(
            f"relayout_arg: arg has {len(leaves)} leaves but fmt_tree has "
            f"{len(fleaves)} — structural mismatch (wrong format tree for "
            "this arg?)")
    out = []
    for leaf, fmt in zip(leaves, fleaves):
        new = jax.device_put(leaf, fmt)
        if donate_old and new is not leaf and isinstance(leaf, jax.Array):
            new.block_until_ready()   # copy done before freeing source
            leaf.delete()
        out.append(new)
    return jax.tree.unflatten(tree, out)


def compile_auto_layouts(fn, args: Tuple, auto_argnums: Sequence[int] = (0,),
                         donate_old: bool = True,
                         donate_argnums: Sequence[int] = None):
    """Compile ``fn(*args)`` letting XLA choose the entry layouts of the
    selected positional args, then relayout those args to the chosen
    formats.

    Returns ``(compiled, new_args)``; call ``compiled(*new_args)``. The
    non-selected args keep default layouts. With ``donate_old`` each
    original leaf buffer is deleted as soon as its relayouted copy is
    ready, bounding transient HBM overhead to one leaf; ``donate_argnums``
    restricts donation to a subset of auto_argnums (use for weight trees
    relaid once-for-the-process while per-clip DATA args keep their
    caller-visible originals alive).

    The compiled object is shape/dtype-specialized to ``args`` (standard
    AOT semantics) — cache it per shape set if called repeatedly; its
    ``input_formats[0]`` gives the per-arg format trees for relaying
    FRESH data args on later calls (relayout_arg).
    """
    if not _HAVE_LAYOUTS:
        return jax.jit(fn), args
    in_sh = tuple(Format(AutoLayout()) if i in set(auto_argnums) else None
                  for i in range(len(args)))
    compiled = jax.jit(fn, in_shardings=in_sh).lower(*args).compile()
    fmts = compiled.input_formats[0]

    donate_set = set(auto_argnums if donate_argnums is None
                     else donate_argnums)
    new_args = list(args)
    for i in auto_argnums:
        new_args[i] = relayout_arg(args[i], fmts[i],
                                   donate_old=donate_old and i in donate_set)
    return compiled, tuple(new_args)
