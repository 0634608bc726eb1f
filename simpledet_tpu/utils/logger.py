"""File + console logging into experiments/<name>/log.txt
(reference utils/logger.py:6 config_logger)."""
import logging
import os
import sys


def config_logger(log_dir=None, name="simpledet_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class Speedometer:
    """samples/sec + metric printout every `frequency` batches
    (reference utils/callback.py:6-38)."""

    def __init__(self, batch_size, frequency, logger):
        self.batch_size = batch_size
        self.frequency = frequency
        self.logger = logger
        self.tic = None
        self.count = 0

    def __call__(self, epoch, n_batch, metric=None, lr=None):
        import time
        self.count += 1
        if self.tic is None:
            self.tic = time.time()
            self.count = 0
            return
        if self.count % self.frequency == 0:
            speed = self.frequency * self.batch_size / (time.time() - self.tic)
            msg = f"Epoch[{epoch}] Batch [{n_batch}]\tSpeed: {speed:.2f} samples/sec"
            if lr is not None:
                msg += f"\tlr: {lr:.6f}"
            if metric is not None:
                for name, val in metric.get():
                    msg += f"\t{name}={val:.5f}"
                metric.reset()
            self.logger.info(msg)
            self.tic = time.time()


class DetailSpeedometer(Speedometer):
    """Per-rank data/compute timing splits (reference utils/callback.py:40).

    Call tic_data()/tic_step() around the loader fetch and device step; the
    periodic line reports both."""

    def __init__(self, batch_size, frequency, logger):
        super().__init__(batch_size, frequency, logger)
        self.data_time = 0.0
        self.step_time = 0.0
        self._t = None

    def tic_data(self):
        import time
        self._t = time.time()

    def toc_data(self):
        import time
        if self._t is not None:
            self.data_time += time.time() - self._t
        self._t = time.time()

    def toc_step(self):
        import time
        if self._t is not None:
            self.step_time += time.time() - self._t
        self._t = None

    def __call__(self, epoch, n_batch, metric=None, lr=None):
        import time
        self.count += 1
        if self.tic is None:
            self.tic = time.time()
            self.count = 0
            return
        if self.count % self.frequency == 0:
            total = time.time() - self.tic
            speed = self.frequency * self.batch_size / total
            msg = (f"Epoch[{epoch}] Batch [{n_batch}]\t"
                   f"Speed: {speed:.2f} samples/sec\t"
                   f"data: {self.data_time:.2f}s compute: {self.step_time:.2f}s")
            if lr is not None:
                msg += f"\tlr: {lr:.6f}"
            if metric is not None:
                for name, val in metric.get():
                    msg += f"\t{name}={val:.5f}"
                metric.reset()
            self.logger.info(msg)
            self.tic = time.time()
            self.data_time = 0.0
            self.step_time = 0.0


class SummaryWriter:
    """Scalar-summary writer (the reference used mxboard TensorBoard
    summaries, doc/TENSORBOARD.md): scalars append both to
    experiments/<name>/events.jsonl (grep/pandas-friendly) and to a real
    TensorBoard events.out.tfevents.* file (utils/tb_events.py) that
    `tensorboard --logdir experiments/<name>` loads directly."""

    def __init__(self, logdir):
        import os
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "events.jsonl")
        self._f = open(self.path, "a")
        from simpledet_tpu.utils.tb_events import TBEventWriter
        self._tb = TBEventWriter(logdir)

    def add_scalar(self, tag, value, global_step=None):
        import json
        import time
        self._f.write(json.dumps({
            "tag": tag, "value": float(value), "step": global_step,
            "wall_time": time.time()}) + "\n")
        self._f.flush()
        self._tb.add_scalar(tag, value, global_step)

    def close(self):
        self._f.close()
        self._tb.close()
