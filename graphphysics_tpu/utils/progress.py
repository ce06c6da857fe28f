"""In-place terminal progress reporting for training/validation loops.

The analog of the reference's ``graphphysics/utils/progressbar.py``
(``ColabProgressBar``, lines 4-18), whose whole job is knowing when NOT to
render a bar (tqdm floods non-interactive logs). Same policy here, without
the tqdm dependency: a single carriage-return line, auto-enabled only when
the stream is a TTY, throttled so the host never busy-writes, and never
fetching device values (a progress line must not add a host sync to the
step loop).
"""

from __future__ import annotations

import sys
import time
from typing import Optional, TextIO


class ProgressReporter:
    """Throttled single-line progress display.

    ``enable=None`` auto-detects: on when ``stream.isatty()``, off otherwise
    (CI logs get the per-epoch summary lines only). All values passed to
    ``update`` must already live on the host — pass nothing device-resident.
    """

    def __init__(
        self,
        total: Optional[int],
        prefix: str = "",
        stream: TextIO = None,
        enable: Optional[bool] = None,
        min_interval: float = 0.5,
    ):
        self.stream = stream if stream is not None else sys.stderr
        if enable is None:
            isatty = getattr(self.stream, "isatty", lambda: False)
            enable = bool(isatty())
        self.enabled = enable
        self.total = total
        self.prefix = prefix
        self.min_interval = min_interval
        self._start = time.perf_counter()
        self._last_write = 0.0
        self._last_len = 0
        self._n = 0

    def update(self, n: int, **stats) -> None:
        """Report progress ``n`` (monotonic count, not an increment)."""
        self._n = n
        if not self.enabled:
            return
        now = time.perf_counter()
        if now - self._last_write < self.min_interval and (
            self.total is None or n < self.total
        ):
            return
        self._last_write = now
        rate = n / max(now - self._start, 1e-9)
        parts = [self.prefix] if self.prefix else []
        if self.total:
            parts.append(f"{n}/{self.total}")
        else:
            parts.append(str(n))
        parts.append(f"{rate:.2f} it/s")
        parts += [f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                  for k, v in stats.items()]
        line = " ".join(parts)
        pad = max(self._last_len - len(line), 0)
        self.stream.write("\r" + line + " " * pad)
        self.stream.flush()
        self._last_len = len(line)

    def close(self) -> None:
        """End the in-place line (no-op when disabled)."""
        if self.enabled and self._last_len:
            self.stream.write("\r" + " " * self._last_len + "\r")
            self.stream.flush()
            self._last_len = 0
