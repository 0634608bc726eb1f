"""Train metrics with ignore-label semantics.

Mirrors core/detection_metric.py in the reference (AccWithIgnore:40,
FgAccWithIgnore:69, CeWithIgnore:88, L1:134, ...): each metric reads named
arrays from the step's aux dict (the analog of reading loss outputs from the
symbol), accumulates sums/counts on host, and reports mean at log frequency.
Ignore label is -1 throughout. Predictions are [..., C] logits/probs; labels
are [...] floats.
"""
import numpy as np


class EvalMetric:
    def __init__(self, name, output_names, label_names=()):
        self.name = name
        self.output_names = list(output_names)
        self.label_names = list(label_names)
        self.reset()

    def reset(self):
        self.sum_metric = 0.0
        self.num_inst = 0.0

    def get(self):
        if self.num_inst == 0:
            return self.name, float("nan")
        return self.name, self.sum_metric / self.num_inst

    def _fetch(self, aux):
        return [np.asarray(aux[n]) for n in self.output_names]


class AccWithIgnore(EvalMetric):
    """argmax accuracy over non-ignored labels (pred [...,C], label [...])."""

    def update(self, aux):
        pred, label = self._fetch(aux)[:2]
        cls = pred.reshape(-1, pred.shape[-1]).argmax(-1)
        label = label.reshape(-1)
        keep = label != -1
        self.sum_metric += float((cls[keep] == label[keep]).sum())
        self.num_inst += float(keep.sum())


class FgAccWithIgnore(EvalMetric):
    """accuracy over foreground (label > 0) entries only."""

    def update(self, aux):
        pred, label = self._fetch(aux)[:2]
        cls = pred.reshape(-1, pred.shape[-1]).argmax(-1)
        label = label.reshape(-1)
        keep = label > 0
        self.sum_metric += float((cls[keep] == label[keep]).sum())
        self.num_inst += float(keep.sum())


class CeWithIgnore(EvalMetric):
    """mean cross-entropy over non-ignored labels (pred = probs or logits)."""

    def update(self, aux):
        pred, label = self._fetch(aux)[:2]
        p = pred.reshape(-1, pred.shape[-1]).astype(np.float64)
        # treat as logits if rows don't sum to ~1
        if not np.allclose(p[:8].sum(-1), 1.0, atol=1e-3):
            p = p - p.max(-1, keepdims=True)
            p = np.exp(p)
            p = p / p.sum(-1, keepdims=True)
        label = label.reshape(-1)
        keep = label != -1
        idx = label[keep].astype(np.int64)
        ll = -np.log(np.maximum(p[keep, idx], 1e-12))
        self.sum_metric += float(ll.sum())
        self.num_inst += float(keep.sum())


class FgCeWithIgnore(CeWithIgnore):
    """CE restricted to foreground labels (reference
    core/detection_metric.py:111)."""

    def update(self, aux):
        pred, label = self._fetch(aux)[:2]
        label = np.asarray(label).reshape(-1).copy()
        label[label == 0] = -1
        aux2 = dict(aux)
        aux2[self.output_names[1]] = label.reshape(
            np.asarray(aux[self.output_names[1]]).shape)
        super().update(aux2)


class EvalMetricWithSummary(EvalMetric):
    """EvalMetric that mirrors values into a SummaryWriter (reference
    core/detection_metric.py:5-38 with mxboard)."""

    def __init__(self, name, output_names, label_names=(), writer=None):
        super().__init__(name, output_names, label_names)
        self.writer = writer
        self.step = 0

    def get(self):
        name, val = super().get()
        if self.writer is not None and self.num_inst > 0:
            self.step += 1
            self.writer.add_scalar(name, val, self.step)
        return name, val


class ScalarLoss(EvalMetric):
    """mean of a scalar loss output (reference ScalarLoss:173)."""

    def update(self, aux):
        val = self._fetch(aux)[0]
        self.sum_metric += float(val)
        self.num_inst += 1.0


class L1(EvalMetric):
    """mean of a (already-reduced) L1 loss output per non-ignored label
    (reference L1:134 divides the summed loss by valid label count)."""

    def update(self, aux):
        vals = self._fetch(aux)
        loss = vals[0]
        if len(vals) > 1:
            label = vals[1].reshape(-1)
            n = float((label != -1).sum())
        else:
            n = 1.0
        self.sum_metric += float(np.asarray(loss).sum())
        self.num_inst += max(n, 1.0) if len(vals) > 1 else 1.0


class SigmoidCrossEntropy(ScalarLoss):
    pass


class CompositeMetric:
    def __init__(self, metrics):
        self.metrics = metrics

    def update(self, aux):
        for m in self.metrics:
            try:
                m.update(aux)
            except KeyError:
                pass

    def reset(self):
        for m in self.metrics:
            m.reset()

    def get(self):
        return [m.get() for m in self.metrics]
