# compat shim package: reference-style `from symbol.builder import ...`
