"""Multi-chip execution: scan-position sharding over a TPU mesh.

The reference is strictly single-GPU (SURVEY.md SS5: no NCCL/MPI anywhere);
this module is the new first-class distributed layer (BASELINE.json:11):

* **P1 position parallelism** (primary): shard the ``nscan`` axis of
  ``scan``/``data`` across a mesh axis. The object and probe are
  replicated; each device runs the full CG loop on its position shard and
  the object/probe gradients and scalar objectives are ``psum``-ed over
  ICI every iteration (see tikejax.solvers.cg, options.axis_name).
* **P2 angle parallelism**: shard the embarrassingly-parallel ``ntheta``
  axis (no collectives needed) -- compose by putting 'theta' first in the
  mesh and sharding all arrays' leading axis.

Everything is ``jax.shard_map`` + XLA collectives: no communication code
of our own, and the whole sharded CG run is still ONE jitted program with
zero host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tikejax.geometry import Geometry
from tikejax.solvers import cg as _cg


def make_mesh(n_devices: int | None = None, axis: str = "scan",
              devices=None) -> Mesh:
    """1-D device mesh for position sharding.

    Args:
      n_devices: number of devices to use (default: all).
      axis: mesh axis name.
      devices: explicit device list (default: ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_problem(mesh: Mesh, data, scan, axis: str | None = None):
    """Place data/scan sharded over the mesh's scan axis (device_put)."""
    axis = axis or mesh.axis_names[-1]
    spec = P(None, axis)
    data = jax.device_put(data, NamedSharding(mesh, spec))
    scan = jax.device_put(scan, NamedSharding(mesh, spec))
    return data, scan


def run_sharded(data, psi0, scan, prb0, geometry: Geometry,
                mesh: Mesh, options: _cg.CGOptions | None = None, **kw):
    """Position-sharded CG reconstruction (BASELINE.json:11).

    Semantics are identical to :func:`tikejax.solvers.run` (up to float
    summation order): the scan axis of ``scan`` and ``data`` is split over
    the mesh, gradients/objectives are globally summed every iteration.

    Args:
      mesh: 1-D mesh; its (last) axis shards scan positions. ``nscan`` must
        be divisible by the axis size.

    Returns:
      (psi, prb, metrics) -- all replicated across devices.
    """
    if options is None:
        options = _cg.CGOptions(**kw)
    elif kw:
        options = dataclasses.replace(options, **kw)
    axis = mesh.axis_names[-1]
    nsh = mesh.shape[axis]
    if geometry.nscan % nsh != 0:
        raise ValueError(
            f"nscan ({geometry.nscan}) must be divisible by the mesh axis "
            f"size ({nsh})")
    # Inside shard_map every device sees its local slice of the scan axis.
    g_local = dataclasses.replace(geometry, nscan=geometry.nscan // nsh)
    options = dataclasses.replace(options, axis_name=axis)

    body = functools.partial(_cg.run_impl, g_local, options)
    # check_vma=False: the Pallas kernels' out_shapes carry no
    # varying-mesh-axes annotation, which the vma type checker rejects;
    # replication of the outputs is instead guaranteed by the psums in
    # the solver and verified numerically in tests/test_sharding.py.
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(), P(None, axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)(data, psi0, scan, prb0)
