# compat shim package: reference-style `from models.FPN.builder import ...`
