"""Retry policy — the reference's SimpleRetry, for driver-side sink
calls (reference: ingestor/retry.go:39-124: doubling delay, cap,
optional ±20% jitter, context-aware cancel).

Scope note: *task-level* retries (the executor work) are Spark's job —
``spark.task.maxFailures``, stage re-attempts, S3A committer retries —
and re-implementing them would fight the scheduler. What Spark does
NOT retry is driver-side code around a foreachBatch body (e.g. a
catalog call, a DLQ write to a flaky object store, a manifest commit).
That is where this policy applies, mirroring how the reference wraps
sink.Write and ack calls.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class SimpleRetry:
    """Exponential backoff with cap and optional jitter.

    attempts: total tries (≥1); base_delay doubles per failure up to
    max_delay; jitter multiplies each sleep by U(0.8, 1.2) like the
    reference's ±20%.
    """

    attempts: int = 3
    base_delay: float = 0.1
    max_delay: float = 5.0
    jitter: bool = True

    def do(
        self,
        fn: Callable[[], T],
        should_stop: Callable[[], bool] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        rng: random.Random | None = None,
    ) -> T:
        """Run ``fn`` under the policy. ``should_stop`` is the context-
        cancellation hook: checked before each attempt and before each
        sleep (the reference aborts mid-backoff on ctx.Done)."""
        if self.attempts < 1:
            raise ValueError("attempts must be >= 1")
        rng = rng or random.Random()
        delay = self.base_delay
        last_err: BaseException | None = None
        for attempt in range(self.attempts):
            if should_stop and should_stop():
                raise InterruptedError("retry cancelled") from last_err
            try:
                return fn()
            except Exception as err:  # noqa: BLE001 — policy wraps any failure
                last_err = err
                if attempt == self.attempts - 1:
                    break
                d = delay * (rng.uniform(0.8, 1.2) if self.jitter else 1.0)
                if should_stop and should_stop():
                    raise InterruptedError("retry cancelled") from last_err
                sleep(min(d, self.max_delay))
                delay = min(delay * 2, self.max_delay)
        assert last_err is not None
        raise last_err
