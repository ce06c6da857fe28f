"""ProgressReporter: the reference utils/progressbar.py analog — a TTY-only
in-place line that never renders into non-interactive logs."""

import io

from graphphysics_tpu.utils.progress import ProgressReporter


class _Tty(io.StringIO):
    def isatty(self):
        return True


def test_disabled_on_non_tty_stream():
    buf = io.StringIO()  # isatty() -> False
    p = ProgressReporter(10, prefix="epoch 0", stream=buf)
    for i in range(1, 11):
        p.update(i, loss=0.5)
    p.close()
    assert buf.getvalue() == ""  # CI logs stay clean


def test_tty_renders_and_close_clears():
    buf = _Tty()
    p = ProgressReporter(3, prefix="epoch 1", stream=buf, min_interval=0.0)
    p.update(1)
    p.update(3, loss=0.25)
    out = buf.getvalue()
    assert "epoch 1" in out and "1/3" in out and "3/3" in out
    assert "loss=0.25" in out and "it/s" in out
    p.close()
    # the close blanks the line with spaces and returns the cursor
    assert buf.getvalue().endswith("\r")


def test_throttle_skips_mid_run_but_not_final():
    buf = _Tty()
    p = ProgressReporter(100, stream=buf, min_interval=3600.0)
    p.update(1)  # first write always lands? (no: throttled vs _last_write=0)
    mid = buf.getvalue()
    p.update(50)
    assert buf.getvalue() == mid  # throttled
    p.update(100)  # n == total bypasses the throttle
    assert "100/100" in buf.getvalue()


def test_explicit_enable_overrides_tty_detection():
    buf = io.StringIO()
    p = ProgressReporter(None, stream=buf, enable=True, min_interval=0.0)
    p.update(7, rate_label="x")
    assert "7" in buf.getvalue()
