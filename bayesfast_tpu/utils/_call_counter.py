"""Tiny call-counting decorator (``bayesfast/utils/_call_counter.py``)."""

import functools

__all__ = ['call_counter']


def call_counter(f):
    @functools.wraps(f)
    def wrapped(*args, **kwargs):
        wrapped.count += 1
        return f(*args, **kwargs)
    wrapped.count = 0
    return wrapped
