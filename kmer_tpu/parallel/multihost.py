"""Multi-host orchestration (SURVEY.md §5.8).

The reference has no communication code at all (no comm crates in
Cargo.lock — SURVEY.md §2 parallelism inventory).  The TPU-native
story: every host runs this same program; `initialize()` joins the
jax.distributed process group (coordinator + process id from env or
args); each host parses ITS OWN slice of the input corpus
(`host_record_range` — deterministic, no coordination needed); host-
local batches are assembled into one globally-sharded array with
jax.make_array_from_process_local_data; the jitted distributed count
step (parallel/distributed.py) then runs SPMD, with the hash-prefix
all_to_all merge riding ICI within a slice and DCN across slices.

Determinism: record ranges are a pure function of (n_records,
process_count), and the count merge is routing-based (equal keys share
an owner chip, integer counts) — so the global table is bit-identical
for any host count, the same contract tests/test_distributed.py pins
for device counts.
"""

from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host process group (no-op for a single process).

    Arguments default to JAX's standard autodetection (COORDINATOR_ADDRESS
    env / TPU pod metadata); explicit values win.  Must run before any
    JAX computation — this function never touches the backend itself
    (calling e.g. jax.process_count() here would initialize it and make
    jax.distributed.initialize impossible).
    """
    import jax
    if num_processes == 1:
        return
    explicit = (coordinator_address is not None or num_processes is not None
                or process_id is not None
                or "COORDINATOR_ADDRESS" in os.environ)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # zero-config on a non-pod host: single-process run, nothing to
        # join — autodetection having nothing to find is not an error


def host_record_range(n_records: int, process_id: int | None = None,
                      process_count: int | None = None) -> tuple[int, int]:
    """[start, end) of the records THIS host parses and feeds.

    Contiguous block partition, remainder spread over the first hosts —
    deterministic in (n_records, process_count) only.
    """
    import jax
    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_records, pc)
    start = pid * base + min(pid, rem)
    return start, start + base + (1 if pid < rem else 0)


def global_batch(mesh, local_rows: dict[str, np.ndarray]):
    """Assemble host-local batch rows into globally-sharded jax arrays.

    local_rows: {"codes": (B_loc, L), "lengths": (B_loc,),
                 "limits": (B_loc,)} — every host must pass the same
    B_loc (pad with zero-length rows) so the global shape is static.

    Returns (codes, lengths, limits) sharded over the mesh "data" axis,
    ready for parallel.distributed.make_distributed_count.
    """
    import jax
    from .mesh import batch_sharding, row_sharding

    bsh = batch_sharding(mesh)
    rsh = row_sharding(mesh)
    B_loc = local_rows["codes"].shape[0]
    gshape = (B_loc * jax.process_count(),) + local_rows["codes"].shape[1:]
    codes = jax.make_array_from_process_local_data(
        bsh, np.ascontiguousarray(local_rows["codes"]), gshape)
    lengths = jax.make_array_from_process_local_data(
        rsh, np.ascontiguousarray(local_rows["lengths"]),
        (B_loc * jax.process_count(),))
    limits = jax.make_array_from_process_local_data(
        rsh, np.ascontiguousarray(local_rows["limits"]),
        (B_loc * jax.process_count(),))
    return codes, lengths, limits
