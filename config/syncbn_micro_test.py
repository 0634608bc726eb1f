"""Micro SyncBN config for CPU e2e tests: the micro flagship with
syncbn normalization so running statistics (batch_stats) are exercised
end-to-end (train -> checkpoint -> eval with running stats), the analog of
the reference's SyncBatchNorm moving mean/var
(operator_cxx/contrib/sync_batch_norm-inl.h:55-73)."""
import config.micro_test as base


def get_config(is_train):
    import os

    os.environ["SIMPLEDET_MICRO_NORM"] = "syncbn"
    try:
        cfg = list(base.get_config(is_train))
    finally:
        del os.environ["SIMPLEDET_MICRO_NORM"]
    General, ModelParam, TestParam = cfg[0], cfg[6], cfg[8]

    class SGeneral(General):
        name = "syncbn_micro_test"
    cfg[0] = SGeneral

    class STestModel(TestParam.model):
        prefix = "experiments/syncbn_micro_test/checkpoint"

    class STestParam(TestParam):
        model = STestModel
    cfg[8] = STestParam
    return tuple(cfg)
