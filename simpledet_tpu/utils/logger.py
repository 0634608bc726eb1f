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
