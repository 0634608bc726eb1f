# compat shim for reference configs importing mxnext helpers
