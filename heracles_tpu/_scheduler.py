"""Tiny single-thread cooperative scheduler (run/gather/sleep).

Replaces the reference's external ``coroutines`` dependency
(``/root/reference/heracles/mapping.py:111-117``): field coroutines of one
catalogue interleave at ``sleep()`` suspension points so they share the
same cached catalogue pages (I/O overlap, not compute parallelism — the
compute runs on the accelerator).
"""

from __future__ import annotations

__all__ = ["run", "gather", "sleep"]


class _Suspend:
    """Awaitable that yields control to the scheduler exactly once."""

    def __await__(self):
        yield


async def sleep():
    """Suspension point: let other coroutines of the group run."""
    await _Suspend()


async def gather(*coros):
    """Drive coroutines round-robin until all complete; returns results."""
    results = [None] * len(coros)
    pending = dict(enumerate(coros))
    while pending:
        for idx in list(pending):
            try:
                pending[idx].send(None)
            except StopIteration as stop:
                results[idx] = stop.value
                del pending[idx]
        if pending:
            await _Suspend()
    return results


def run(main):
    """Run a coroutine (tree of gather/sleep awaits) to completion."""
    try:
        while True:
            main.send(None)
    except StopIteration as stop:
        return stop.value
