"""Host-side retry-controller logic (texgs.train.pair_cap) + the shared
auto-backend resolution (texgs.kernels.uvtex_raster.resolve_backends).

These steer the production stage-3 loop (cap growth vs XLA fallback vs
parking) — pure host logic, testable without a device.
"""

import jax

from texgs.kernels.uvtex_raster import resolve_backends
from texgs.train.pair_cap import PairCapController, TexMissController


def test_texmiss_grows_before_falling_back():
    c = TexMissController(floor=4096, max_cap=1 << 19)
    assert c.backend_for_step() == "textile"
    # overflow -> power-of-two growth covering 1.25x the true miss count
    assert c.on_overflow(84654) == "textile"
    assert c.cap == 131072
    assert c.on_overflow(45619) == "textile"
    assert c.cap == 262144
    # growth continues to max_cap before any xla step
    assert c.on_overflow(150000) == "textile"
    assert c.cap == 524288
    # true miss count beyond max_cap: xla for the retry, not parked yet
    assert c.on_overflow(600000) == "xla"
    assert c.backend_for_step() == "textile"  # still probing textile


def test_texmiss_parks_and_reprobes():
    c = TexMissController(floor=4096, max_cap=8192, park_after=2,
                          probe_interval=10)
    c.on_overflow(100000)           # grows to 8192? no: beyond max -> xla
    c.on_overflow(100000)           # second fallback -> parked
    assert c._parked
    seq = [c.backend_for_step() for _ in range(20)]
    assert seq.count("textile") == 2          # one probe per interval
    assert seq.count("xla") == 18


def test_paircap_grows_and_observes():
    c = PairCapController()
    d = 1 << 14
    c.grow(20000, d)
    assert c.current(d) >= 20000
    before = c.current(d)
    c.observe(1000, d)              # shrink-or-hold policy must never drop
    assert c.current(d) <= before   # below a cap that fits observations
    assert c.current(d) >= 1000


def test_resolve_backends_cpu_rules():
    assert jax.default_backend() == "cpu"
    # small scenes -> exact oracle; big -> scan; texture follows blend
    b, tb = resolve_backends("auto", "auto", 1024)
    assert (b, tb) == ("reference", "xla")
    b, tb = resolve_backends("auto", "auto", 100_000)
    assert (b, tb) == ("scan", "xla")
    b, tb = resolve_backends("pallas", "auto", 100_000)
    assert (b, tb) == ("pallas", "textile")
    # explicit choices pass through
    assert resolve_backends("fused", "xla", 10) == ("fused", "xla")


def test_texmiss_cap_shrinks_when_calm():
    c = TexMissController(floor=4096, max_cap=1 << 19, shrink_patience=3)
    c.on_overflow(300000)           # grows to 2^19
    assert c.cap == 524288
    for _ in range(2):
        c.on_textile_ok(n_miss_total=10000)
    assert c.cap == 524288          # patience not yet reached
    c.on_textile_ok(n_miss_total=10000)
    assert c.cap == 65536           # 4x 10k -> pow2 = 65536
    # a burst above a quarter of the cap resets the calm counter
    c.on_textile_ok(n_miss_total=60000)
    assert c.cap == 65536
