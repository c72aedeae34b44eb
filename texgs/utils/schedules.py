"""Learning-rate schedules (host-side callables, used by texgs.train.optim).

expon_lr: log-linear decay with optional sin-eased delay, parity with
get_expon_lr_func (/root/reference/utils/general.py:38-71).
warmup_multistep: LinearLR(0.01 -> 1 over 100 steps) chained with
MultiStepLR milestones, parity with the UV-net scheduler
(/root/reference/models/uv_map_gaussian3d.py:76-86).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence


def expon_lr(lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000,
             ) -> Callable[[int], float]:
    def helper(step: int) -> float:
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * math.sin(
                0.5 * math.pi * min(max(step / lr_delay_steps, 0.0), 1.0))
        else:
            delay_rate = 1.0
        t = min(max(step / max_steps, 0.0), 1.0)
        log_lerp = math.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def warmup_multistep(base_lr: float, milestones: Sequence[int], gamma: float,
                     warmup_iters: int = 100, start_factor: float = 0.01,
                     ) -> Callable[[int], float]:
    """Step counter semantics follow torch schedulers stepped once per
    iteration *after* the optimizer step: at optimizer step k (0-based) the
    factor corresponds to scheduler epoch k."""
    milestones = sorted(milestones)

    def helper(step: int) -> float:
        if step < warmup_iters:
            warm = start_factor + (1.0 - start_factor) * (step / warmup_iters)
        else:
            warm = 1.0
        decay = gamma ** sum(1 for m in milestones if step >= m)
        return base_lr * warm * decay

    return helper
