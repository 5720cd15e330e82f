"""Shared auto-build loader for the native C++ libraries.

Both native components — the ingest parser (io/native/fasta_pack.cpp)
and the host aggregator/renderer (pipeline/native/aggregate.cpp) — ship
as source and are compiled with g++ on first use, so the wheel carries
no binary artifacts and a toolchain-less host falls back to the numpy
paths.  This module is the single copy of the staleness check and build
command (they previously drifted: -Wextra in the Makefiles but not the
inline commands).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-Wall", "-Wextra", "-pthread"]


def autobuild_cdll(src: str, so_path: str,
                   extra_link: tuple[str, ...] = ()) -> ctypes.CDLL:
    """Compile `src` to `so_path` if missing/stale and dlopen it.

    Raises on any failure (missing g++, compile error, bad .so) —
    callers latch the failure and fall back to their numpy path.
    """
    stale = (not os.path.exists(so_path)
             or os.path.getmtime(so_path) < os.path.getmtime(src))
    if stale:
        # build to a process-unique temp name and os.rename() into
        # place (atomic on POSIX): two processes (multihost driver,
        # pytest-xdist) may race the first-use build of the same path,
        # and dlopening a concurrently-overwritten .so fails and
        # latches the numpy fallback for one of them
        tmp = f"{so_path}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                ["g++", *CXXFLAGS, "-shared", "-o", tmp, src, *extra_link],
                check=True, capture_output=True)
            os.rename(tmp, so_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return ctypes.CDLL(so_path)
