"""Hierarchical progress-reporting protocol.

Parity with the reference's progress subsystem
(``/root/reference/heracles/progress.py:28-93``): a tiny protocol with
``update``/``task`` plus context-manager semantics, a no-op default, and
(in :mod:`heracles_tpu.rich_progress` / :mod:`heracles_tpu.notebook`)
terminal and Jupyter implementations.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

__all__ = ["Progress", "NoProgress"]


@runtime_checkable
class Progress(Protocol):
    """Protocol for progress reporting."""

    def update(self, current: int | None = None, total: int | None = None) -> None:
        """Update progress of this task."""

    def task(self, label: str) -> "Progress":
        """Create a subtask with the given label."""

    def __enter__(self) -> "Progress":
        """Start this task."""

    def __exit__(self, *exc) -> None:
        """Stop this task."""


class NoProgress:
    """No-op progress implementation (the default)."""

    def update(self, current=None, total=None):
        pass

    def task(self, label):
        return NoProgress()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return None
