"""Deadline-guarded device->host transfers.

On this box's TPU relay a readback can hang indefinitely while compute and
block_until_ready stay healthy (bench.py round-3 postmortem). Anything in
the PACKAGE that must read a device value back (e.g. the k_cand
auto-sizing probe) goes through guarded_scalar: the transfer runs in a
daemon thread with a deadline and a stall returns the fallback instead of
wedging renderer creation.
"""

from __future__ import annotations

import threading


def guarded_scalar(x, timeout: float = 60.0, default=None):
    """np.asarray(x) with a deadline; `default` on stall or error."""
    import numpy as np

    box: dict = {}

    def work():
        try:
            box["v"] = np.asarray(x)
        except Exception as e:  # noqa: BLE001
            box["e"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    return box.get("v", default)
