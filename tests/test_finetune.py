"""M6 — distributed QA fine-tune loop (parameter averaging) and the
try-import-gated transformer backend."""

from __future__ import annotations

import pickle
import types

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aicoe_osc_demo_spark.training import (
    arithmetic_qa_backend,
    finetune_qa,
    hf_qa_finetune_backend,
)


def _qa_df(spark, n=64):
    return spark.range(n).select(
        F.lit("q").alias("question"),
        F.concat(F.lit("ctx "), F.col("id")).alias("context"),
        (F.col("id") % 7).cast("long").alias("start_position"),
        (F.col("id") % 7 + 1).cast("long").alias("end_position"),
    )


def test_finetune_loop_loss_decreases_and_learns_mean(spark):
    res = finetune_qa(_qa_df(spark), arithmetic_qa_backend(), epochs=2)
    assert len(res["loss_sums"]) == 2
    assert res["loss_sums"][1] < res["loss_sums"][0]
    assert res["n_examples"] == 64
    w = pickle.loads(res["state"])["w_milli"]
    # ids 0..63 -> start positions (id % 7), mean 2.953125 -> 2953 milli
    assert w == 2953


def test_finetune_loop_partitioning_invariant(spark):
    # exact sufficient statistics: ANY partitioning gives bit-identical
    # results — the property that makes the loop oracle-checkable
    df = _qa_df(spark)
    r1 = finetune_qa(df.repartition(1), arithmetic_qa_backend(), epochs=2)
    r7 = finetune_qa(df.repartition(7), arithmetic_qa_backend(), epochs=2)
    assert r1["loss_sums"] == r7["loss_sums"]
    assert pickle.loads(r1["state"]) == pickle.loads(r7["state"])


def test_finetune_tree_merge_no_driver_collect(spark, monkeypatch):
    # merge_states backends must never materialize per-partition states at
    # the driver: the epoch reduction is an executor-side treeReduce, so
    # DataFrame.collect must not run at all during the loop
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("driver-side DataFrame.collect in finetune_qa tree path")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    res = finetune_qa(_qa_df(spark).repartition(8), arithmetic_qa_backend(), epochs=2)
    assert pickle.loads(res["state"])["w_milli"] == 2953
    assert res["n_examples"] == 64


def test_finetune_legacy_backend_collect_path_matches_tree(spark):
    # a backend implementing only the legacy contract (no merge_states)
    # takes the per-partition collect + average_states path and produces
    # the identical result (exact integer statistics)
    full = arithmetic_qa_backend()

    class _Legacy:
        init_state = staticmethod(full.init_state)
        train_step = staticmethod(full.train_step)
        average_states = staticmethod(full.average_states)

    df = _qa_df(spark).repartition(5)
    r_tree = finetune_qa(df, full, epochs=2)
    # the collect path is opt-in: without the flag, a merge_states-less
    # backend is refused loudly instead of silently walling the driver
    with pytest.raises(ValueError, match="allow_driver_merge"):
        finetune_qa(df, _Legacy(), epochs=2)
    r_legacy = finetune_qa(df, _Legacy(), epochs=2, allow_driver_merge=True)
    assert r_tree["loss_sums"] == r_legacy["loss_sums"]
    assert pickle.loads(r_tree["state"]) == pickle.loads(r_legacy["state"])


def test_hf_backend_gate_raises_without_runtime():
    try:
        import transformers  # noqa: F401

        pytest.skip("transformers installed; gate not reachable")
    except ImportError:
        pass
    from aicoe_osc_demo_spark.operators.inference import ModelLoadError

    with pytest.raises(ModelLoadError, match="transformers"):
        hf_qa_finetune_backend("some/checkpoint")


class _FakeLoss:
    def backward(self):
        self.backprop_ran = True

    def __float__(self):
        return 0.25


class _FakeModel:
    def __init__(self):
        self._state = {"w": 1.0}

    def state_dict(self):
        return dict(self._state)

    def load_state_dict(self, d):
        self._state = dict(d)

    def train(self):
        return self

    def parameters(self):
        return []

    def __call__(self, *, start_positions, end_positions, **enc):
        return types.SimpleNamespace(loss=_FakeLoss())


class _FakeOptim:
    def __init__(self, params, lr):
        self.lr = lr

    def step(self):
        pass

    def zero_grad(self):
        pass


def _fake_modules():
    transformers = types.SimpleNamespace(
        AutoTokenizer=types.SimpleNamespace(
            from_pretrained=lambda cp: (lambda *a, **k: {"input_ids": [[0]]})
        ),
        AutoModelForQuestionAnswering=types.SimpleNamespace(
            from_pretrained=lambda cp: _FakeModel()
        ),
    )
    torch = types.SimpleNamespace(
        save=lambda obj, buf: pickle.dump(obj, buf),
        load=lambda buf: pickle.load(buf),
        tensor=lambda x: x,
        optim=types.SimpleNamespace(AdamW=_FakeOptim),
    )
    return transformers, torch


def test_hf_backend_real_path_with_stub_modules():
    # drives the REAL hf_qa_finetune_backend code (tokenize → forward with
    # span positions → backward → optimizer step → state roundtrip →
    # weighted averaging) against minimal stand-in modules
    backend = hf_qa_finetune_backend("cp", modules=_fake_modules())
    state = backend.init_state()
    assert pickle.loads(state) == {"w": 1.0}
    batch = pd.DataFrame(
        {
            "question": ["q1", "q2"],
            "context": ["c1", "c2"],
            "start_position": [0, 1],
            "end_position": [1, 2],
        }
    )
    new_state, loss = backend.train_step(state, batch)
    assert loss == 0.25
    avg = backend.average_states([new_state, new_state], [2, 2])
    assert pickle.loads(avg)["w"] == pytest.approx(1.0)
    # pairwise tree merge agrees with the flat weighted average
    merged = backend.merge_states(new_state, 2, new_state, 2)
    assert pickle.loads(merged)["w"] == pytest.approx(pickle.loads(avg)["w"])
    # ... and with UNEQUAL weights: merge(s1,1, s2,3) == average([s1,s2],[1,3])
    s_a = pickle.dumps({"w": 2.0})
    s_b = pickle.dumps({"w": 6.0})
    m_uneq = backend.merge_states(s_a, 1, s_b, 3)
    a_uneq = backend.average_states([s_a, s_b], [1, 3])
    assert pickle.loads(m_uneq)["w"] == pytest.approx(pickle.loads(a_uneq)["w"]) == 5.0


def test_hf_backend_through_distributed_loop(spark):
    # the REAL hf backend object (with stand-in modules) must survive the
    # whole distributed loop: closure-shipped into mapInPandas, states
    # tree-merged on executors, one merged state back per epoch.
    # The fake classes live in this (non-importable-on-worker) test module,
    # so ship them by value.
    import sys

    from pyspark import cloudpickle

    mod = sys.modules[__name__]
    cloudpickle.register_pickle_by_value(mod)
    try:
        backend = hf_qa_finetune_backend("cp", modules=_fake_modules())
        res = finetune_qa(_qa_df(spark, n=16).repartition(4), backend, epochs=1)
    finally:
        cloudpickle.unregister_pickle_by_value(mod)
    assert pickle.loads(res["state"])["w"] == pytest.approx(1.0)
    assert res["n_examples"] == 16
    # loss: one _FakeLoss(0.25) per train_step call (one per Arrow batch);
    # at least one batch per non-empty partition
    assert res["loss_sums"][0] >= 0.25
