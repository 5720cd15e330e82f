"""Profiling hooks + roofline accounting (SURVEY.md §5.1).

The reference has zero observability (no timers, no tracing crates —
Cargo.toml:8-10).  Here:

  * `trace(dir)` wraps jax.profiler.trace — open the dump with
    tensorboard/xprof to see per-op device timelines;
  * `Roofline` converts a measured stage time into achieved fraction of
    the HBM roofline, the north-star metric (BASELINE.json: >=80% of
    roofline k-mers/s/chip).

The roofline model for sort-mode counting charges the minimum HBM
traffic the algorithm must move: the code batch in, plus one round trip
of the packed keys for the VMEM-resident sort (read once, write once),
plus the run-length outputs.  Dense mode charges the histogram update
instead.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

# Peak HBM bandwidth per chip, bytes/s.  v5e ≈ 819 GB/s (public spec);
# override for other parts.
HBM_BYTES_PER_S = {
    "v5e": 819e9,
    "v4": 1228e9,
    "v5p": 2765e9,
    "v6e": 1640e9,
}


def detect_hbm_bw(default: float = 819e9) -> float:
    """Best-effort peak HBM bandwidth of the attached device."""
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
        for tag, bw in HBM_BYTES_PER_S.items():
            if tag in kind.replace(" ", ""):
                return bw
        if "v5 lite" in kind or "v5lite" in kind:
            return HBM_BYTES_PER_S["v5e"]
    except Exception:
        pass
    return default


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


@dataclass
class Roofline:
    """Minimum-traffic model for one count step."""
    batch_bytes: int      # packed code batch in
    key_bytes: int        # N * W * 4, one read + one write for the sort
    out_bytes: int        # run-length outputs

    @property
    def total_bytes(self) -> int:
        return self.batch_bytes + 2 * self.key_bytes + self.out_bytes

    def seconds_at_roofline(self, hbm_bytes_per_s: float | None = None) -> float:
        return self.total_bytes / (hbm_bytes_per_s or detect_hbm_bw())

    def fraction(self, measured_seconds: float,
                 hbm_bytes_per_s: float | None = None) -> float:
        """Achieved fraction of the HBM roofline (1.0 = speed of light)."""
        return self.seconds_at_roofline(hbm_bytes_per_s) / measured_seconds

    @staticmethod
    def for_sort_step(B: int, L: int, k: int, W: int) -> "Roofline":
        N = B * (L - k + 1)
        return Roofline(batch_bytes=B * L,
                        key_bytes=N * W * 4,
                        out_bytes=N * (W * 4 + 4 + 1))

    @staticmethod
    def for_fused_step(B: int, L: int, k: int, W: int,
                       cnt_bytes: int = 4) -> "Roofline":
        """Minimum traffic for the FUSED single-kernel step: codes in
        once, keys + counts out once — no sort round trip (key_bytes=0;
        the two-stage model above budgets one read + one write between
        extraction and sort, which the fused kernel eliminated).  The
        honest denominator for the production default."""
        N = B * (L - k + 1)
        return Roofline(batch_bytes=B * L, key_bytes=0,
                        out_bytes=N * (W * 4 + cnt_bytes))

    @staticmethod
    def for_dense_step(B: int, L: int, k: int) -> "Roofline":
        N = B * (L - k + 1)
        hist = 4 ** k * 4
        return Roofline(batch_bytes=B * L, key_bytes=N * 2,
                        out_bytes=2 * hist)
