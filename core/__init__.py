# compat shim package: reference-style `from core.detection_input import ...`
