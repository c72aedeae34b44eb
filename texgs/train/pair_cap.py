"""Host-side pair-capacity feedback for the tile binner.

The CUDA rasterizer the reference pip-installs sizes its duplicated-key
buffer exactly per frame (SURVEY.md §2.2 internals); our static-shape
binning (texgs.kernels.binning) instead uses a fixed ``pair_cap`` and
reports the true uncapped count + an overflow flag.  This controller turns
those reports into a power-of-two cap schedule (same bucketing idea as the
Gaussian capacity growth in texgs.train.gaussian3d._round_capacity):

  * overflow  -> grow immediately to the next bucket above ``slack * true``
    and have the caller RE-RUN the step — functional train steps make the
    retry exact, so no silently-truncated frame ever reaches a gradient;
  * sustained slack (cap > 2 * needed for ``shrink_patience`` consecutive
    reports) -> shrink one observation's bucket, trading one re-trace for a
    proportional cut in binning/raster work every following step.

Caps are jit-static (they size every pair-indexed array), so every change
costs a re-trace; the bucketing bounds how many can ever happen.
"""

from __future__ import annotations

from typing import Optional


def next_pow2(n: int, floor: int = 1 << 14) -> int:
    cap = floor
    while cap < n:
        cap *= 2
    return cap


class PairCapController:
    """Tracks one render path's pair cap (stage trainers keep one each)."""

    def __init__(self, slack: float = 1.25, shrink_patience: int = 200,
                 floor: int = 1 << 14, log=None):
        self.slack = slack
        self.shrink_patience = shrink_patience
        self.floor = floor
        self.log = log
        self.cap: Optional[int] = None   # None -> caller's default
        self._calm = 0

    def current(self, default: int) -> int:
        return self.cap if self.cap is not None else default

    def grow(self, n_pairs: int, default: int) -> int:
        """Overflow observed: bump the cap above the true count."""
        need = next_pow2(int(n_pairs * self.slack), self.floor)
        cur = self.current(default)
        new = max(need, cur * 2)
        if self.log:
            self.log.warning(
                f"pair_cap overflow: {n_pairs} true pairs > cap {cur}; "
                f"growing to {new} and re-running the step")
        self.cap = new
        self._calm = 0
        return new

    def observe(self, n_pairs: int, default: int) -> bool:
        """Non-overflow report.  Returns True if the cap changed (shrink)."""
        need = next_pow2(int(n_pairs * self.slack), self.floor)
        cur = self.current(default)
        if need * 2 <= cur:
            self._calm += 1
            if self._calm >= self.shrink_patience:
                new = max(need, self.floor)
                if self.log:
                    self.log.info(
                        f"pair_cap shrink: {cur} -> {new} "
                        f"({n_pairs} true pairs)")
                self.cap = new
                self._calm = 0
                return True
        else:
            self._calm = 0
        return False


class TexMissController:
    """Textile miss-cap schedule + textile/xla mode parking (stage 3).

    The windowed textile kernel (texgs.kernels.pallas_textile) drops
    requests its windows cannot serve and folds up to ``cap`` of them back
    exactly; ``tex_miss`` > 0 in the step stats means requests were lost,
    so the step result is discarded and re-run — first with a power-of-two
    cap growth (misses are compacted hierarchically, so moderate caps stay
    ~ms), then on the exact per-tap XLA path once misses exceed
    ``max_cap`` (an untrained/incoherent UV map can miss nearly every
    request, where no cap helps).  Repeated cap-exceeding overflows park
    the trainer on the XLA path; every ``probe_interval`` steps it retries
    textile once (~0.1 s wasted if still incoherent) so the smooth-UV
    production regime snaps back to the fast path as the UV map trains.
    """

    def __init__(self, floor: int = 4096, max_cap: int = 1 << 20,
                 park_after: int = 4, probe_interval: int = 250,
                 shrink_patience: int = 100, log=None):
        # max_cap 2^20: the correction's cost is K gathers + compaction
        # nonzeros — even at 1M it stays FAR cheaper than a whole-frame
        # XLA fallback step (~11 s measured r2), and the full prod run
        # showed early-stage-3 frames missing >524k of ~15M requests
        # while the UV net is still warming up.  The shrink schedule
        # (on_textile_ok) claws the per-step compaction cost back once
        # the map turns coherent.  Park on xla only when the UV map is so
        # incoherent that no cap helps.
        self.cap = floor
        self.floor = floor
        self.max_cap = max_cap
        self.park_after = park_after
        self.probe_interval = probe_interval
        self.log = log
        self._fallbacks = 0
        self._parked = False
        self._steps_parked = 0
        self.shrink_patience = shrink_patience
        self._shrink_calm = 0

    def backend_for_step(self) -> str:
        """Backend for a fresh step (before any overflow report)."""
        if not self._parked:
            return "textile"
        self._steps_parked += 1
        if self._steps_parked % self.probe_interval == 0:
            return "textile"
        return "xla"

    def on_overflow(self, n_dropped: int) -> str:
        """Textile dropped n_dropped requests: pick the retry backend."""
        total = self.cap + int(n_dropped)
        need = next_pow2(int(total * 1.25), self.floor)
        if need <= self.max_cap and need > self.cap:
            if self.log:
                self.log.warning(
                    f"textile miss overflow: {n_dropped} dropped at cap "
                    f"{self.cap}; growing to {need} and re-running")
            self.cap = need
            self._shrink_calm = 0
            return "textile"
        self._fallbacks += 1
        if not self._parked and self._fallbacks >= self.park_after:
            self._parked = True
            self._steps_parked = 0
            if self.log:
                self.log.warning(
                    "textile misses exceed max cap repeatedly; parking on "
                    f"the XLA texture path (re-probe every "
                    f"{self.probe_interval} steps)")
        return "xla"

    def on_textile_ok(self, n_miss_total=None) -> None:
        if self._parked and self.log:
            self.log.info("textile probe clean; resuming the fast path")
        self._parked = False
        self._fallbacks = 0
        # cap SHRINK (round 4): the compacted correction's nonzero passes
        # scale with the STATIC cap (kb = cap/32 blocks scanned every
        # step), so an early-training growth to 2^19 taxes every later
        # step (~1 s/step measured at 512k) even once the UV map is
        # coherent and misses are tiny.  After shrink_patience calm steps
        # whose raw miss count fits in a quarter of the cap, drop to 4x
        # the observed count (recompile once, save every step after).
        if n_miss_total is None or self.cap <= self.floor:
            return
        need = next_pow2(max(int(n_miss_total), 1) * 4, self.floor)
        if need * 2 <= self.cap:
            self._shrink_calm += 1
            if self._shrink_calm >= self.shrink_patience:
                if self.log:
                    self.log.info(
                        f"textile miss cap shrink: {self.cap} -> {need} "
                        f"({int(n_miss_total)} raw misses)")
                self.cap = need
                self._shrink_calm = 0
        else:
            self._shrink_calm = 0
