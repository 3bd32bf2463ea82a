"""Wall-time measurement with the reference's load-bearing log format.

The report pipeline regex-parses ``<name> took <X> seconds`` lines from
``training.log`` (reference /root/reference/src/utils.py:25-31 and
inference notebook cell 4), so the format is a contract we keep.
"""
from __future__ import annotations

import contextlib
import functools
import logging
import time

logger = logging.getLogger('mile_tpu')


@contextlib.contextmanager
def measure_time(name: str):
    """Context manager logging ``{name} took Xs`` (parseable by reporting)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        logger.info('%s took %.4f seconds', name, elapsed)


def timed(name: str):
    """Decorator flavour of :func:`measure_time`."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with measure_time(name):
                return fn(*args, **kwargs)

        return wrapper

    return deco
