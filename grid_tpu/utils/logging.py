"""Console logging and progress display.

Covers the observability surface of the reference
(``grid/utils/utils.py:13-43`` — ``log`` and ``progress_bar``, and the themed
console of ``grid/cli.py:14-30``), with the same graceful degradation: every
function works with ``console=None`` (plain ``print``) so library use never
requires rich.
"""

from __future__ import annotations

from contextlib import contextmanager

try:
    from rich.console import Console
    from rich.theme import Theme
    from rich.progress import (
        Progress,
        SpinnerColumn,
        TextColumn,
        BarColumn,
        TaskProgressColumn,
        TimeElapsedColumn,
    )

    _HAVE_RICH = True
except Exception:  # pragma: no cover - rich is in the base image
    _HAVE_RICH = False


THEME = {
    "info": "cyan",
    "success": "bold green",
    "warning": "yellow",
    "danger": "bold red",
    "highlight": "magenta",
}


def make_console():
    """Build the themed console used by the CLI (ref: grid/cli.py:14-30)."""
    if not _HAVE_RICH:
        return None
    return Console(theme=Theme(THEME))


def log(console, msg, style=None):
    """Log a message to the rich console, or print if console is None.

    Mirrors the reference helper (grid/utils/utils.py:13-20) so step modules
    can be exercised headless in tests.
    """
    if console is not None:
        if style:
            console.print(msg, style=style)
        else:
            console.print(msg)
    else:
        print(msg)


class _NullProgress:
    """Progress stand-in when no console is attached."""

    def update(self, task, **kwargs):
        pass

    def advance(self, task, advance=1):
        pass


@contextmanager
def progress_bar(console=None, total=1, description="Working"):
    """Reusable spinner+bar progress context (ref: grid/utils/utils.py:23-43).

    Yields ``(progress, task)``. With ``console=None`` yields a no-op progress
    object so step code is branch-free.
    """
    if console is None or not _HAVE_RICH:
        yield _NullProgress(), None
        return
    with Progress(
        SpinnerColumn(spinner_name="dots", style="info"),
        TextColumn("[progress.description]{task.description}", style="highlight"),
        BarColumn(complete_style="success", finished_style="success"),
        TaskProgressColumn(),
        TimeElapsedColumn(),
        console=console,
    ) as progress:
        task = progress.add_task(description, total=total)
        yield progress, task
