"""Compat shim: reference symbol/component.py (an older snapshot of the
builder classes — superseded by symbol/builder.py in the reference too)."""
from symbol.builder import *  # noqa: F401,F403
