"""Reference-parity mode: byte-exact reproduction of the reference's
stdout — the sorted dump, duplicates retained, of every gapped L+R chunk
(main.rs:87-90; md5 contract `1a4ca1e7d4f2e70253aadca10d8351b4` on
sample.fasta per BASELINE.md).

Device side: gapped extraction + full multiset sort of 108-bit keys.
Host side: vectorized decode of sorted keys to newline-terminated ASCII.
Per-batch sorted dumps are globally merged with a numpy mergesort over
fixed-width |S54 byte strings.
"""

from __future__ import annotations

import hashlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KmerConfig
from ..io.fasta import iter_batches, parse_fasta
from ..ops.count import sort_words
from ..ops.encode import decode_key_words_to_lines
from ..ops.extract import SENTINEL, gapped_lanes


@partial(jax.jit, static_argnames=("l_len", "r_len", "c_min", "c_max"))
def parity_step(codes, lengths, limits, *, c_min: int, c_max: int,
                l_len: int = 27, r_len: int = 27):
    """One batch: all gapped chunk keys, sorted, sentinels last."""
    words, _ = gapped_lanes(codes, lengths, l_len, r_len,
                            c_min=c_min, c_max=c_max, limits=limits)
    s = sort_words(words)
    n_valid = jnp.sum((s[0] != SENTINEL).astype(jnp.int32))
    return s, n_valid


def _decode_step(step_out, cfg: KmerConfig) -> np.ndarray:
    """Decode one device-sorted batch to an (n,) |S55 line array."""
    n_chars = cfg.l_len + cfg.r_len
    s, n_valid = step_out
    n_valid = int(n_valid)
    keys = np.stack([np.asarray(w)[:n_valid] for w in s], axis=1)
    raw = decode_key_words_to_lines(keys, n_chars)   # includes '\n's
    return np.frombuffer(raw, dtype=f"S{n_chars + 1}")


def parity_dump(path: str, cfg: KmerConfig | None = None) -> bytes:
    """Full sorted dump bytes for a FASTA file (reference stdout).

    Device sort of batch i overlaps host decode of batch i-1 (the
    decode lags one step behind the async dispatch).
    """
    cfg = cfg or KmerConfig(gapped=True, batch_reads=256, max_read_len=512)
    if not cfg.gapped:
        cfg = cfg.replace(gapped=True)
    parts: list[np.ndarray] = []
    codes, offsets = parse_fasta(path)
    pending = None
    for batch in iter_batches(codes, offsets, batch_reads=cfg.batch_reads,
                              max_len=cfg.max_read_len, overlap=cfg.overlap):
        out = parity_step(jnp.asarray(batch.codes),
                          jnp.asarray(batch.lengths),
                          jnp.asarray(batch.start_limits),
                          c_min=cfg.c_min, c_max=cfg.c_max,
                          l_len=cfg.l_len, r_len=cfg.r_len)
        if pending is not None:
            parts.append(_decode_step(pending, cfg))
        pending = out
    if pending is not None:
        parts.append(_decode_step(pending, cfg))
    if not parts:
        return b""
    if len(parts) == 1:
        merged = parts[0]
    else:
        merged = np.concatenate(parts)
        merged.sort(kind="stable")
    return merged.tobytes()


def parity_md5(path: str, cfg: KmerConfig | None = None) -> str:
    return hashlib.md5(parity_dump(path, cfg)).hexdigest()


# The measured contract for the reference's bundled corpus (BASELINE.md).
SAMPLE_FASTA_MD5 = "1a4ca1e7d4f2e70253aadca10d8351b4"
