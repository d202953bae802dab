"""Chipless HBM footprint analysis for jitted programs.

XLA's TPU AOT compiler runs without touching the chip (on the axon relay it
is explicitly chipless), so a program's HBM budget — temp scratch, argument
residency, donation aliasing — can be measured for ANY batch/window/quant
configuration without allocating a byte of device memory. This is how the
round-2 ring-scatter capacity bug was found (BASELINE.md): build the inputs
on host, lower on ShapeDtypeStructs, compile, read `memory_analysis()`.

No reference analog: the reference sizes GPU memory empirically
(`inferix/core/memory/utils.py` free-memory probes at runtime).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def abstractify(tree: Any) -> Any:
    """Map a pytree of (host) arrays / scalars to ShapeDtypeStructs.

    Leaves that are already ShapeDtypeStructs (e.g. from jax.eval_shape)
    pass through untouched, so fully-abstract pytrees can be mixed with
    concrete ones.
    """
    def leaf(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return a
        a = jnp.asarray(a)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    return jax.tree.map(leaf, tree)


def analyze_program(jitted, *args, abstract: bool = True,
                    **kwargs) -> Dict[str, float]:
    """Compile `jitted(*args, **kwargs)` and return its HBM budget in GiB.

    args may be concrete host arrays or ShapeDtypeStructs; with
    abstract=True (default) they are abstractified first so nothing is
    transferred to a device. Returns dict with temp_gib / argument_gib /
    output_gib / alias_gib / code_mib. Raises whatever the compiler raises
    (an OOM report arrives as a RuntimeError whose message contains XLA's
    largest-allocations breakdown — itself worth reading).
    """
    if abstract:
        args = abstractify(args)
        kwargs = abstractify(kwargs)
    compiled = jitted.lower(*args, **kwargs).compile()
    ma = compiled.memory_analysis()
    return {
        "temp_gib": ma.temp_size_in_bytes / 2**30,
        "argument_gib": ma.argument_size_in_bytes / 2**30,
        "output_gib": ma.output_size_in_bytes / 2**30,
        "alias_gib": ma.alias_size_in_bytes / 2**30,
        "code_mib": ma.generated_code_size_in_bytes / 2**20,
    }


def fits_hbm(jitted, *args, hbm_gib: float = 15.75,
             reserved_gib: float = 0.26) -> bool:
    """Whether the program + its arguments fit the chip's HBM.

    Output that aliases donated arguments is not double-counted.
    """
    try:
        m = analyze_program(jitted, *args)
    except Exception as e:  # compile-time OOM IS the answer
        if "Ran out of memory" in str(e):
            return False
        raise
    used = (m["temp_gib"] + m["argument_gib"] + reserved_gib
            + (m["output_gib"] - m["alias_gib"]))
    return used <= hbm_gib
