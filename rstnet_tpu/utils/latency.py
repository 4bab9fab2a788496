"""Frame-latency telemetry: percentiles + backend-recovery classification.

A real-time serving budget is a TAIL budget: the reference logs per-frame
wall time for every frame (``MLLM_v2/moshi/server.py:144``) and the 80 ms
frame period must hold at p99, not just at the median. Two confounders make
naive tails lie on this backend:

* **Backend-recovery frames.** The tunneled TPU backend can wedge and
  recover (see ``bench.py::_wait_for_healthy_backend``); the first frames
  after recovery take seconds and are transport artifacts, not serving
  latency. Round 3's headline p99 (82.8 ms) was exactly such a frame. They
  must be *annotated and excluded separately*, never silently dropped.
* **Small samples.** p99 over 50 frames is the max; a credible p99 needs a
  few hundred frames.

:func:`classify_recovery` marks outliers with a robust median-relative rule
(a recovery frame is 10-100x the steady-state time, far outside any honest
jitter), and :class:`FrameLatencyTracker` reports both the raw tail and the
steady-state tail plus how many frames were excluded — so a clean run shows
identical numbers and a polluted run shows its pollution.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


def percentile(sorted_ms: Sequence[float], q: float) -> float:
    """Nearest-rank percentile of an ascending-sorted sequence."""
    if not sorted_ms:
        return float("nan")
    idx = min(int(len(sorted_ms) * q), len(sorted_ms) - 1)
    return sorted_ms[idx]


def classify_recovery(
    lat_ms: Sequence[float], factor: float = 5.0, floor_ms: float = 250.0
) -> list[bool]:
    """True for frames that are backend-recovery artifacts, not jitter.

    A frame is classified as a recovery frame when it exceeds BOTH
    ``factor * median`` and ``median + floor_ms``. The conjunction keeps the
    rule honest at both ends of the latency scale:

    * fast pipelines (median ~6 ms): a 40 ms hiccup is 6.6x the median but
      real scheduling jitter that must stay IN the tail — the absolute
      floor keeps it;
    * slow pipelines (median ~70 ms): a 400 ms frame is only ~5.7x but is a
      multi-frame stall — still, it must exceed 5x to be excluded, so a
      system that is simply over budget cannot classify itself healthy.

    Recovery stalls on this backend measure seconds (10-100x), so they pass
    both tests; anything a serving loop could plausibly produce fails one.
    """
    n = len(lat_ms)
    if n == 0:
        return []
    s = sorted(lat_ms)
    med = s[n // 2]
    cut = max(factor * med, med + floor_ms)
    return [x > cut for x in lat_ms]


@dataclasses.dataclass
class FrameLatencyTracker:
    """Accumulates per-frame wall-clock latencies for one session/loop."""

    budget_ms: float = 80.0
    samples_ms: list = dataclasses.field(default_factory=list)

    def record(self, ms: float) -> None:
        self.samples_ms.append(float(ms))

    def summary(self) -> dict:
        """Raw and steady-state percentiles + recovery-frame accounting.

        ``p99_ms`` is over ALL frames; ``p99_steady_ms`` excludes frames
        classified as backend-recovery artifacts (``n_recovery_excluded``
        says how many, ``recovery_ms`` lists them so nothing disappears
        silently). ``p99_under_budget`` judges the steady-state tail
        against the frame budget.
        """
        lat = self.samples_ms
        if not lat:
            return {"n_frames": 0}
        s = sorted(lat)
        mask = classify_recovery(lat)
        steady = sorted(x for x, bad in zip(lat, mask) if not bad)
        recovery = [round(x, 1) for x, bad in zip(lat, mask) if bad]
        out = {
            "n_frames": len(lat),
            "p50_ms": round(percentile(s, 0.50), 3),
            "p90_ms": round(percentile(s, 0.90), 3),
            "p99_ms": round(percentile(s, 0.99), 3),
            "max_ms": round(s[-1], 3),
            "n_recovery_excluded": len(recovery),
        }
        if steady:
            out["p99_steady_ms"] = round(percentile(steady, 0.99), 3)
            out["p99_under_budget"] = out["p99_steady_ms"] < self.budget_ms
        if recovery:
            out["recovery_ms"] = recovery[:16]
        return out
