from __future__ import annotations

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.functions.schema import schema_ddl
from aicoe_osc_demo_spark.operators.inference import infer_from_squad, infer_single_pair
from aicoe_osc_demo_spark.operators.reshape import nest_to_squad
from aicoe_osc_demo_spark.sources.files import (
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
    write_table,
)
from aicoe_osc_demo_spark.training import grid_search


def test_csv_json_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], ["id", "s", "v"])
    for writer, reader, sub in [
        (write_csv, lambda s, p: read_csv(s, p, "id long, s string, v double"), "csv"),
        (write_json, lambda s, p: read_json(s, p, "id long, s string, v double"), "json"),
        (write_parquet, read_parquet, "parquet"),
    ]:
        path = str(tmp_path / sub)
        writer(df, path)
        back = reader(spark, path)
        assert sorted((r.id, r.s, r.v) for r in back.collect()) == [(1, "a", 1.5), (2, "b", 2.5)]


def test_write_table_parquet_and_orc(spark, tmp_path):
    # S8/S9 — CTAS table sinks (the Trino CREATE TABLE ... WITH(format=...)
    # + batched INSERT path collapses into saveAsTable)
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    for fmt in ("parquet", "orc"):
        name = f"t_{fmt}"
        write_table(df, name, fmt=fmt, path=str(tmp_path / name))
        back = spark.table(name)
        assert back.collect()[0].name == "x"
        spark.sql(f"DROP TABLE {name}")


def test_schema_ddl(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["id", "s", "v"])
    ddl = schema_ddl(df)
    assert "id BIGINT" in ddl and "s STRING" in ddl and "v DOUBLE" in ddl


def test_infer_single_pair(spark):
    out = infer_single_pair(spark, "some paragraph about climate", "What is X?")
    assert out["answer"] == "some paragraph about climate"  # first 8 tokens
    expected = ((31 * len("some paragraph about climate") + 17 * len("What is X?")) % 1000) / 1000.0
    assert out["score"] == expected


def test_infer_from_squad_roundtrip(spark):
    flat = spark.createDataFrame(
        [
            ("f1", "context alpha beta gamma delta", "What is alpha?", "id1", "alpha", [8]),
            ("f1", "context epsilon zeta eta theta", "What is zeta?", "id2", "zeta", [16]),
        ],
        ["source_file", "context", "question", "example_id", "answer", "answer_start"],
    )
    squad = nest_to_squad(flat)
    preds = infer_from_squad(squad, top_k=1).collect()
    assert {r.example_id for r in preds} == {"id1", "id2"}
    assert all(r.answer for r in preds)


def test_model_loading_path(monkeypatch):
    # the REAL loading path (S12/M1/M2): a non-"stub" spec routes through
    # load_hf_checkpoint and is cached once per spec; the stub never does
    import pandas as pd

    from aicoe_osc_demo_spark.operators import inference as inf

    class FakeModel:
        def __init__(self, path):
            self.path = path

        def predict_relevance(self, question, text):
            return pd.Series([0.9] * len(text), index=text.index)

    loaded = []

    def fake_loader(path):
        loaded.append(path)
        return FakeModel(path)

    monkeypatch.setattr(inf, "load_hf_checkpoint", fake_loader)
    inf._MODEL_CACHE.clear()
    try:
        m1 = inf._get_model("/ckpt/relevance-roberta")
        m2 = inf._get_model("/ckpt/relevance-roberta")
        assert isinstance(m1, FakeModel) and m1 is m2  # executor-local singleton
        assert loaded == ["/ckpt/relevance-roberta"]  # loaded exactly once
        assert isinstance(inf._get_model("stub"), inf._StubModel)
        scores = m1.predict_relevance(pd.Series(["q"]), pd.Series(["t"]))
        assert scores.iloc[0] == 0.9
    finally:
        inf._MODEL_CACHE.clear()


def test_model_loading_without_runtime_raises():
    # in a transformers-less container the real path fails loud, not silent
    import pytest

    from aicoe_osc_demo_spark.operators import inference as inf

    try:
        import transformers  # noqa: F401

        pytest.skip("transformers installed; failure path not reachable")
    except ImportError:
        pass
    inf._MODEL_CACHE.clear()
    with pytest.raises(inf.ModelLoadError, match="transformers"):
        inf._get_model("/ckpt/does-not-matter")
    inf._MODEL_CACHE.clear()


def test_grid_search_picks_best(spark):
    rows = [(i, ("spark " * 5 if i % 2 else "plain words here"), i % 2) for i in range(60)]
    df = (
        spark.createDataFrame(rows, ["id", "text", "label"])
        .select(
            "id",
            F.concat_ws(" [SEP] ", F.lit("q"), "text").alias("pair_text"),
            F.col("label").cast("double").alias("label"),
        )
    )
    best = grid_search(df, "id", param_grid=[{"max_iter": 5}, {"max_iter": 10}], n_folds=2)
    assert 0.5 < best["mean_f1"] <= 1.0
    assert "params" in best and len(best["folds"]) == 2


def test_successive_halving_prunes(spark):
    # Optuna-pruning semantics (trainer_optuna.py:14-120): most of the grid
    # never reaches full-resource evaluation
    from aicoe_osc_demo_spark.training import successive_halving_search

    rows = [(i, ("spark " * 5 if i % 2 else "plain words here"), i % 2) for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "text", "label"]).select(
        "id",
        F.concat_ws(" [SEP] ", F.lit("q"), "text").alias("pair_text"),
        F.col("label").cast("double").alias("label"),
    )
    grid = [{"max_iter": 2}, {"max_iter": 4}, {"max_iter": 6}, {"max_iter": 8}]
    out = successive_halving_search(df, "id", param_grid=grid, n_folds=2, eta=2)
    assert out["n_full_evaluations"] < len(grid)  # pruned trials < full grid
    assert len(out["pruned"]) + out["n_full_evaluations"] == len(grid)
    assert 0.5 < out["mean_f1"] <= 1.0
    assert out["rungs"][-1]["fraction"] == 1.0
    assert out["rungs"][0]["n_trials"] == len(grid)


def test_tpe_search_deterministic_and_concentrates():
    # the adaptive-sampling half of trainer_optuna.py (optuna's TPESampler):
    # reproducible md5-stream draws, and the Parzen l(x)/g(x) acquisition
    # steers later trials toward the optimum on a known objective
    from aicoe_osc_demo_spark.training import tpe_search

    space = {"x": ("uniform", 0.0, 1.0)}
    obj = lambda p: -((p["x"] - 0.7) ** 2)  # noqa: E731
    r1 = tpe_search(space, obj, n_trials=24, n_startup=5, seed="t")
    r2 = tpe_search(space, obj, n_trials=24, n_startup=5, seed="t")
    assert r1 == r2  # fully deterministic, no RNG state
    assert abs(r1["params"]["x"] - 0.7) < 0.1
    xs = [t["params"]["x"] for t in r1["trials"]]
    startup_err = sum(abs(x - 0.7) for x in xs[:5]) / 5
    guided_err = sum(abs(x - 0.7) for x in xs[-8:]) / 8
    assert guided_err < startup_err  # adaptive phase beats the prior draws
    # a different seed explores differently but still converges
    r3 = tpe_search(space, obj, n_trials=24, n_startup=5, seed="u")
    assert r3["trials"] != r1["trials"]
    assert abs(r3["params"]["x"] - 0.7) < 0.15


def test_tpe_search_mixed_space_types():
    from aicoe_osc_demo_spark.training import tpe_search

    space = {
        "lr": ("loguniform", 1e-5, 1e-1),
        "layers": ("int", 1, 8),
        "head": ("choice", ["cls", "mean", "max"]),
    }

    # optimum: lr near 1e-3, layers near 4, head == "mean"
    def obj(p):
        import math

        return (
            -((math.log10(p["lr"]) + 3) ** 2)
            - 0.1 * (p["layers"] - 4) ** 2
            + (1.0 if p["head"] == "mean" else 0.0)
        )

    out = tpe_search(space, obj, n_trials=30, n_startup=6, seed="m")
    assert 1e-5 <= out["params"]["lr"] <= 1e-1
    assert isinstance(out["params"]["layers"], int) and 1 <= out["params"]["layers"] <= 8
    assert out["params"]["head"] in ("cls", "mean", "max")
    # the guided phase should find the categorical optimum
    assert out["params"]["head"] == "mean"
    assert abs(__import__("math").log10(out["params"]["lr"]) + 3) < 1.0


def test_tpe_search_drives_spark_cv_objective(spark):
    # each TPE trial launches a distributed evaluation, exactly the
    # reference's optuna-wraps-FARM-training shape
    from aicoe_osc_demo_spark.training import cross_validate, tpe_search

    rows = [(i, ("spark " * 5 if i % 2 else "plain words here"), i % 2) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "text", "label"]).select(
        "id",
        F.concat_ws(" [SEP] ", F.lit("q"), "text").alias("pair_text"),
        F.col("label").cast("double").alias("label"),
    )

    def obj(params):
        folds = cross_validate(df, "id", n_folds=2, max_iter=params["max_iter"])
        return sum(f["f1"] for f in folds) / len(folds)

    out = tpe_search({"max_iter": ("int", 2, 8)}, obj, n_trials=3, n_startup=2, seed="s")
    assert 0.5 < out["score"] <= 1.0
    assert 2 <= out["params"]["max_iter"] <= 8
    assert len(out["trials"]) == 3


def test_write_training_shards_layout_and_pruning(spark, tmp_path):
    from aicoe_osc_demo_spark.sources.files import write_training_shards

    rows = [(i, "w " * 50, "a" if i < 6 else "b") for i in range(10)]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], ["doc_id", "text", "source"]
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, budget_tokens=100, shard_col="source")
    back = spark.read.parquet(path)
    # every document survives with its packing metadata
    assert back.count() == 10
    # 50 tokens/doc, budget 100 -> 2 docs per bin; shard a has 6 docs -> 3
    # bins, shard b has 4 docs -> 2 bins
    import os

    a_bins = {d for d in os.listdir(os.path.join(path, "shard=a")) if d.startswith("bin=")}
    b_bins = {d for d in os.listdir(os.path.join(path, "shard=b")) if d.startswith("bin=")}
    assert a_bins == {"bin=0", "bin=1", "bin=2"}
    assert b_bins == {"bin=0", "bin=1"}
    # partition pruning: a bin-filtered read scans only that directory
    pruned = back.filter("shard = 'a' AND bin = 1")
    assert pruned.count() == 2
    # layout contract: ONE data file per bin directory (the repartition on
    # the directory key), and rows inside it already offset-ordered (the
    # within-task sort) — the concat-and-slice loader needs no re-sort
    for d in ("shard=a/bin=1", "shard=b/bin=0"):
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
        offs = [
            r.start_offset
            for r in spark.read.parquet(os.path.join(path, d, files[0])).collect()
        ]
        assert offs == sorted(offs)
    got = [r.doc_id for r in pruned.orderBy("start_offset").collect()]
    assert got == [2, 3]
