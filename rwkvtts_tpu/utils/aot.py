"""Chipless TPU AOT compilation for kernel validation.

The local ``libtpu`` can compile full v5e executables — including the
Mosaic pass pipeline (layout inference / apply-vector-layout), which is
where Pallas kernels that trace and lower fine actually die — without a
TPU attached and without the remote tunnel. This is exactly what the
tunnel's own compile helper does ("TpuAotCompiler (chipless)"); running
it locally turns a ~5-min chip-queue round trip per Mosaic experiment
into seconds.

Usage:
    from rwkvtts_tpu.utils.aot import aot_compile_tpu
    aot_compile_tpu(fn, x, y)          # raises on compile failure

Must run in a process whose jax platform is NOT the tunnel (set
``jax.config.update("jax_platforms", "cpu")`` before any jax use, or the
axon sitecustomize will own the backend).
"""
from __future__ import annotations

import functools
import os

import jax
import numpy as np

_TOPOLOGY = "v5e:2x2"  # smallest layout the default host bounds divide


@functools.lru_cache(maxsize=1)
def _topology():
    os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
    from jax.experimental import topologies

    return topologies.get_topology_desc(
        platform="tpu", topology_name=_TOPOLOGY
    )


def tpu_device_sharding():
    """A single-device NamedSharding on the chipless v5e topology."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    topo = _topology()
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    return NamedSharding(mesh, PartitionSpec())


def aot_compile_tpu(fn, *args, static_argnums=()):
    """AOT-compile ``fn(*args)`` for one v5e chip without hardware.

    ``args`` are arrays or ShapeDtypeStructs; only shape/dtype are used.
    Returns the jax Compiled object. Raises the same Mosaic/XLA errors a
    real-chip compile would — use it to validate Pallas kernels before
    paying tunnel time.
    """
    sh = tpu_device_sharding()

    def spec(a):
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)

    in_specs = jax.tree.map(spec, tuple(args))
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*in_specs)
    return lowered.compile()
