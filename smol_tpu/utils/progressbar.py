"""Progress bar wrapper with a no-op fallback (mirrors smol/utils/progressbar.py)."""

from __future__ import annotations

try:
    import tqdm
except ImportError:
    tqdm = None

__all__ = ["progress_bar"]


class _NullBar:
    """No-op progress bar."""

    def __init__(self, total=None, description=None):
        self.total = total

    def update(self, n=1):
        pass

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class _TqdmBar:
    def __init__(self, total=None, description=None):
        self._bar = tqdm.tqdm(total=total, desc=description)

    def update(self, n=1):
        self._bar.update(n)

    def close(self):
        self._bar.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


def progress_bar(display: bool, total=None, description=None):
    """A (possibly no-op) progress bar context manager."""
    if display and tqdm is not None:
        return _TqdmBar(total=total, description=description)
    return _NullBar(total=total, description=description)
