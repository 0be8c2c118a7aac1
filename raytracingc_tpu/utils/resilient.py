"""Failure detection and recovery for long renders.

The reference's failure handling is ``exit(1|42|69)`` (SURVEY.md §5.3) and a
crash loses the whole render. Here long renders run as checkpointed sample
batches (``render/progressive.py``), so recovery is restart-and-resume. This
module adds the supervision loop: run a checkpointed render, catch device/
runtime failures (preemption, interconnect hiccups, OOM after fragmentation),
re-initialize, and resume from the last completed batch — bounded retries,
exponential backoff, and a progress watchdog that refuses to "retry" if no
batch ever completes (a deterministic failure, not a transient one).
"""

from __future__ import annotations

import time
from typing import Callable

import jax


class RenderFailure(RuntimeError):
    """A render failed permanently (retries exhausted or no progress)."""


def render_resilient(
    render_batches: Callable[[], tuple],
    *,
    progress: Callable[[], int],
    max_retries: int = 3,
    backoff_s: float = 2.0,
    on_failure: Callable[[Exception, int], None] | None = None,
):
    """Supervise ``render_batches`` (a checkpointed render closure).

    ``render_batches()`` runs (or resumes) the render and returns its result;
    ``progress()`` reports a monotone completion counter (e.g. samples done,
    read from the checkpoint) so the supervisor can distinguish transient
    failures (progress advanced since last attempt → retry budget refreshes)
    from deterministic ones (no progress → fail fast after ``max_retries``).
    """
    retries_left = max_retries
    last_progress = progress()
    attempt = 0
    while True:
        try:
            return render_batches()
        except (RuntimeError, jax.errors.JaxRuntimeError) as e:  # device-level
            attempt += 1
            now = progress()
            if now > last_progress:
                retries_left = max_retries  # forward progress: refresh budget
                last_progress = now
            else:
                retries_left -= 1
            if on_failure is not None:
                on_failure(e, attempt)
            if retries_left < 0:
                raise RenderFailure(
                    f"render failed after {attempt} attempts with no progress "
                    f"since batch counter {last_progress}"
                ) from e
            time.sleep(backoff_s * (2 ** min(attempt - 1, 4)))
