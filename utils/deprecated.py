"""Deprecation decorator (reference utils/deprecated.py)."""
import functools
import warnings


def deprecated(reason=""):
    def wrap(fn):
        @functools.wraps(fn)
        def inner(*a, **kw):
            warnings.warn(f"{fn.__name__} is deprecated. {reason}",
                          DeprecationWarning, stacklevel=2)
            return fn(*a, **kw)
        return inner
    return wrap
