"""Compat shim: reference core/detection_metric.py metric classes."""
from simpledet_tpu.core.metrics import (  # noqa: F401
    AccWithIgnore,
    CeWithIgnore,
    CompositeMetric,
    EvalMetric,
    FgAccWithIgnore,
    L1,
    ScalarLoss,
    SigmoidCrossEntropy,
)
from simpledet_tpu.core.metrics import (  # noqa: F401,E402
    EvalMetricWithSummary,
    FgCeWithIgnore,
)
