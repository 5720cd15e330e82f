"""Device-side counting: sort + segment-sum, and dense 4^k histogram.

The reference materializes 3.55M heap strings and comparison-sorts them
(main.rs:50,87).  Here keys are fixed-width uint32 word tuples; counting
is either:

  * sort mode (any k): multi-key sort (lexicographic over W words; the
    all-ones sentinel of invalid lanes sorts to the end), then run
    boundaries + segment-sum give (unique key, multiplicity) entirely on
    device with static shapes;
  * dense mode (k <= 12): a 4^k int32 scatter-add histogram — one HBM
    table, no sort at all.

Both paths are jit-compiled; host code only compacts static-shape
outputs (drop sentinel runs) after the fact.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from .extract import SENTINEL

DENSE_K_MAX = 12

# sort backend, override with KMER_TPU_SORT=auto|xla|pallas.
# Measured on v5e (scripts/debug_sort_tpu.py): XLA's multi-operand sort
# hits a fast radix path at ~0.1 ms for 1M 2-word keys — already at the
# HBM roofline — so "auto" = lax.sort; the Pallas VMEM-resident bitonic
# kernel (ops/pallas/sort.py) stays as an opt-in backend.
_SORT_BACKEND = os.environ.get("KMER_TPU_SORT", "auto")


def sort_words(words: list[jnp.ndarray],
               backend: str | None = None) -> list[jnp.ndarray]:
    """Lexicographic sort of flattened W-word keys (duplicates kept)."""
    flat = [w.reshape(-1) for w in words]
    backend = backend or _SORT_BACKEND
    if backend == "pallas":
        from .pallas.sort import sort_words_pallas
        # off-TPU a forced pallas backend runs interpreted (testing)
        return sort_words_pallas(flat,
                                 interpret=jax.default_backend() != "tpu")
    if len(flat) == 1 and jax.default_backend() == "tpu":
        # XLA:TPU's single-operand sort takes a ~10x slower path than
        # its variadic sort (measured: 25 ms vs 2.7 ms per 2^20 keys);
        # a throwaway payload operand selects the fast path.
        dummy = jnp.zeros_like(flat[0])
        out = lax.sort((flat[0], dummy), num_keys=1)
        return [out[0]]
    return list(lax.sort(tuple(flat), num_keys=len(flat)))


def sort_words_grouped(words: list[jnp.ndarray], groups: int
                       ) -> list[jnp.ndarray]:
    """Sort W-word keys within `groups` independent equal slices of the
    flattened key stream (lax.sort over a batch dimension).

    Why: the sort is O(n log^2 n), so g sorts of n/g keys beat one sort
    of n — measured on v5e: 2^21 keys flat = 477 M keys/s, in 2^13-key
    groups = 1.7 B keys/s.  The output is only group-locally sorted;
    equal keys may repeat across groups, so callers must aggregate with
    KmerTable.from_pairs (run_lengths itself stays correct: group
    boundaries either start a new run naturally or legitimately merge
    equal adjacent runs, and sentinel tails sort to each group's end).
    """
    flat = [w.reshape(-1) for w in words]
    n = flat[0].shape[0]
    assert n % groups == 0, (n, groups)
    m = n // groups
    shaped = tuple(f.reshape(groups, m) for f in flat)
    out = lax.sort(shaped, num_keys=len(shaped), dimension=1)
    return list(out)           # (G, m) shaped; flatten at the caller


def run_lengths_grouped(sorted_2d: list[jnp.ndarray]):
    """run_lengths over (G, m) group-locally sorted words: scans run
    along axis 1 (depth m instead of n — much better VPU shape), runs
    never span groups.  Returns flat (G*m,) is_start / counts."""
    G, m = sorted_2d[0].shape
    neq = jnp.zeros((G, m), bool).at[:, 0].set(True)
    for w in sorted_2d:
        neq = neq | (jnp.roll(w, 1, axis=1) != w).at[:, 0].set(True)
    is_start = neq
    idx = lax.broadcasted_iota(jnp.int32, (G, m), 1)
    start_pos = jnp.where(is_start, idx, m)
    suffix_min = lax.cummin(start_pos, axis=1, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[:, 1:], jnp.full((G, 1), m, jnp.int32)], axis=1)
    valid = sorted_2d[0] != SENTINEL
    counts = jnp.where(is_start & valid, next_start - idx, 0)
    return is_start.reshape(-1), counts.reshape(-1)


def run_lengths(sorted_words: list[jnp.ndarray]):
    """Run boundaries + multiplicities of a sorted key stream.

    Returns (is_start, counts) both shape (N,):
      is_start[i] — lane i begins a run of equal keys;
      counts[i]   — multiplicity of that run if is_start[i], else 0.
    Sentinel lanes (invalid) are excluded from counts but may still set
    is_start at the sentinel run head (count 0, dropped on compaction).

    Scan-based, scatter-free: a run's length is the distance to the next
    run start, found with one reverse cummin — runs of equal keys are
    homogeneous (all real or all sentinel), so no per-lane validity sum
    is needed.
    """
    n = sorted_words[0].shape[0]
    neq = jnp.zeros((n,), bool).at[0].set(True)
    for w in sorted_words:
        neq = neq | (jnp.roll(w, 1) != w).at[0].set(True)
    is_start = neq
    idx = jnp.arange(n, dtype=jnp.int32)
    start_pos = jnp.where(is_start, idx, n)
    suffix_min = lax.cummin(start_pos, axis=0, reverse=True)
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full((1,), n, jnp.int32)])
    valid = sorted_words[0] != SENTINEL
    counts = jnp.where(is_start & valid, next_start - idx, 0)
    return is_start, counts


def sort_count(words: list[jnp.ndarray]):
    """sorted keys + run info; the core device count step (sort mode)."""
    s = sort_words(words)
    is_start, counts = run_lengths(s)
    return s, is_start, counts


def dense_histogram(word: jnp.ndarray, valid: jnp.ndarray, k: int,
                    hist: jnp.ndarray | None = None,
                    backend: str | None = None) -> jnp.ndarray:
    """Counts into a dense 4^k table (k <= DENSE_K_MAX).

    `word` is the single-word key (B, P) or flat; invalid lanes add 0.
    Pass `hist` to accumulate across batches (donate it under jit).

    Backends: "mxu" (alias "pallas") = Pallas one-hot matmul histogram
    (k <= 8, the TPU fast path — XLA scatter-add serializes); "xla" =
    scatter-add; "auto" (default, or env KMER_TPU_DENSE) picks mxu on
    TPU when eligible.
    """
    assert k <= DENSE_K_MAX, f"dense mode needs k <= {DENSE_K_MAX}"
    backend = backend or os.environ.get("KMER_TPU_DENSE", "auto")
    from .pallas.histogram import DENSE_MXU_K_MAX
    use_mxu = k <= DENSE_MXU_K_MAX and word.size < (1 << 24) and (
        backend in ("mxu", "pallas") or
        (backend == "auto" and jax.default_backend() == "tpu"))
    if use_mxu:
        from .pallas.histogram import dense_histogram_mxu
        h = dense_histogram_mxu(word, valid, k,
                                interpret=jax.default_backend() != "tpu")
        return h if hist is None else hist + h
    size = 4 ** k
    idx = jnp.where(valid, word, 0).astype(jnp.int32).reshape(-1)
    upd = valid.astype(jnp.int32).reshape(-1)
    if hist is None:
        hist = jnp.zeros((size,), jnp.int32)
    return hist.at[idx].add(upd, mode="drop")
