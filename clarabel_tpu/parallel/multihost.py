"""Multi-host (DCN) mesh construction and distributed initialization.

The reference has no distributed story at all — its single parallel knob
is a threaded Pardiso factorization (reference: src/settings.jl:108-110).
The TPU-native scaling design places the two parallel axes of this solver
onto the two interconnect tiers:

* **dp** (independent problem instances / scenario batches) — embarrassingly
  parallel, per-instance while-loop masking, no per-iteration
  communication except the final gather: safe to stripe across **DCN**
  (slow inter-host network).
* **tp** (block-arrow KKT factorization: vmapped block LDLs + one psum of
  the dense Schur complement per IPM iteration) — latency/bandwidth-bound
  collectives every iteration: must stay on **ICI** (intra-slice
  interconnect), i.e. within one host's local devices or one pod slice.

`make_solver_mesh` encodes that placement with
`mesh_utils.create_hybrid_device_mesh`, which lays mesh axes out so that
the trailing (tp) axis maps to ICI neighbours and the leading (dp) axis
crosses DCN. See jax-ml.github.io/scaling-book for the mesh/collective
mental model.
"""

import os
from typing import Optional

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize `jax.distributed` for multi-host execution.

    No-op (returns False) when neither arguments nor the standard
    environment variables (JAX_COORDINATOR_ADDRESS / cloud TPU metadata)
    indicate a multi-process run — so the call is safe in single-host
    scripts and tests.
    """
    import jax

    env_addr = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if env_addr is None and num_processes is None and (
        os.environ.get("TPU_WORKER_HOSTNAMES") is None
    ):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-process fallback
        return jax.process_count() > 1


def make_solver_mesh(dp: Optional[int] = None, tp: int = 1,
                     devices=None):
    """Build a (dp, tp) mesh with tp on ICI and dp allowed to cross DCN.

    dp defaults to `total_devices // tp`.  On a single host (or CPU test
    mesh) this reduces to a plain reshaped mesh; in a multi-process run it
    uses the hybrid DCN/ICI layout so the per-iteration Schur psum never
    leaves the slice.
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    total = len(devices)
    if dp is None:
        dp = total // tp
    if dp * tp > total:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, "
                         f"have {total}")

    n_procs = getattr(jax, "process_count", lambda: 1)()
    if n_procs > 1:
        from jax.experimental import mesh_utils

        local = total // n_procs
        # tp must fit within one host's ICI-connected devices
        if tp > local:
            raise ValueError(
                f"tp={tp} exceeds {local} local devices; per-iteration "
                "Schur collectives must stay on ICI"
            )
        try:
            dev_mesh = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(dp // n_procs if dp >= n_procs else 1, tp),
                dcn_mesh_shape=(min(dp, n_procs), 1),
                devices=devices,
            )
        except ValueError:
            # devices without slice attributes (e.g. multi-process CPU
            # simulation): group by process index manually — dp rows come
            # from whole processes, tp stays within one process's devices
            if dp % n_procs:
                raise ValueError(
                    f"dp={dp} must be a multiple of process count "
                    f"{n_procs}"
                )
            by_proc = {}
            for d in devices:
                by_proc.setdefault(d.process_index, []).append(d)
            rows = []
            for pi in sorted(by_proc):
                devs = by_proc[pi]
                per = dp // n_procs
                if per * tp > len(devs):
                    raise ValueError(
                        f"process {pi} has {len(devs)} devices, needs "
                        f"{per * tp}"
                    )
                for r in range(per):
                    rows.append(devs[r * tp:(r + 1) * tp])
            dev_mesh = np.array(rows)
        return Mesh(dev_mesh, axis_names=("dp", "tp"))

    dev_mesh = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(dev_mesh, axis_names=("dp", "tp"))


def mesh_placement_report(mesh) -> str:
    """Human-readable summary of which axes ride which interconnect."""
    import jax

    n_procs = getattr(jax, "process_count", lambda: 1)()
    lines = [f"mesh axes: {dict(zip(mesh.axis_names, mesh.devices.shape))}"]
    lines.append(f"processes (hosts): {n_procs}")
    if n_procs > 1:
        lines.append("dp axis: striped across hosts (DCN) then local devices")
        lines.append("tp axis: local devices only (ICI collectives)")
    else:
        lines.append("single host: all axes on local devices")
    return "\n".join(lines)
