"""Training surface (SURVEY.md §2.9, M5-M9) — the Spark-idiomatic option A
from the survey: an MLlib pipeline for the relevance text-pair classifier,
hash-based cross-validation, and the evaluation metrics.

The reference trains FARM/transformer models on a GPU
(ref: /root/reference/src/models/farm_trainer.py:26-432,
qa_farm_trainer.py:21-200); those weights are unavailable here, and a faithful
re-implementation would be TorchDistributor-driven.  What IS in-scope for the
engine — and what this module provides — is:

- data prep as DataFrame ops (dedup, seeded-deterministic shuffle/split:
  farm_trainer.py:73-77);
- a trainable relevance baseline: Tokenizer → HashingTF → IDF →
  LogisticRegression (the MLlib analogue of the TextPairClassification head);
- k-fold cross-validation with hash-assigned folds (M7,
  farm_trainer.py:262-348) — fold membership is a pure function of the row
  key, so folds are reproducible under any partitioning;
- eval metrics (M9): accuracy / precision / recall / F1 from a confusion
  aggregate, plus the relaxed span-overlap F1 used by the QA evaluation
  (ref: src/components/utils/qa_metrics.py:8-81).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from .functions.hashing import bucket_of


def make_relevance_pipeline(num_features: int = 1 << 14, max_iter: int = 20):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    return Pipeline(
        stages=[
            Tokenizer(inputCol="pair_text", outputCol="tokens"),
            HashingTF(inputCol="tokens", outputCol="tf", numFeatures=num_features),
            IDF(inputCol="tf", outputCol="features"),
            LogisticRegression(maxIter=max_iter, labelCol="label", featuresCol="features"),
        ]
    )


def prepare_pairs(
    df: DataFrame,
    question_col: str,
    text_col: str,
    label_col: str,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Text-pair input prep: the FARM processor concatenates the pair with a
    separator (max_seq_len truncation is the tokenizer's job downstream).
    ``keep`` carries key columns through (e.g. the split key)."""
    return df.select(
        F.concat_ws(" [SEP] ", F.col(question_col), F.col(text_col)).alias("pair_text"),
        F.col(label_col).cast("double").alias("label"),
        *[F.col(c) for c in keep],
    )


def train_relevance(train_df: DataFrame, **kwargs):
    """M5 — fit the baseline relevance classifier.

    Refuses an empty training frame: MLlib's L-BFGS dies deep in the JVM
    on 0 rows — fail at the contract boundary with the actionable message
    instead."""
    if train_df.isEmpty():
        raise ValueError(
            "train_relevance: training data is empty — nothing to fit"
        )
    return make_relevance_pipeline(**kwargs).fit(train_df)


def confusion_metrics(scored: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> DataFrame:
    """M9 — accuracy/precision/recall/F1 from one confusion aggregate."""
    agg = scored.agg(
        F.count(F.when((F.col(pred_col) == 1) & (F.col(label_col) == 1), 1)).alias("tp"),
        F.count(F.when((F.col(pred_col) == 1) & (F.col(label_col) == 0), 1)).alias("fp"),
        F.count(F.when((F.col(pred_col) == 0) & (F.col(label_col) == 1), 1)).alias("fn"),
        F.count(F.when((F.col(pred_col) == 0) & (F.col(label_col) == 0), 1)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    precision = tp / F.greatest(tp + fp, F.lit(1))
    recall = tp / F.greatest(tp + fn, F.lit(1))
    return agg.select(
        ((tp + tn) / F.greatest(tp + fp + fn + tn, F.lit(1))).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        (2 * precision * recall / F.greatest(precision + recall, F.lit(1e-9))).alias("f1"),
    )


def cross_validate(
    df: DataFrame, key_col: str, n_folds: int = 3, **pipeline_kwargs
) -> list[dict]:
    """M7 — k-fold CV with hash-assigned folds (reproducible under any
    partitioning; the reference's DataSiloForCrossVal becomes a bucket
    column + two filters per fold)."""
    folded = df.withColumn("fold", bucket_of(F.col(key_col), n_folds, salt="cv"))
    results = []
    for fold in range(n_folds):
        train = folded.filter(F.col("fold") != fold).drop("fold")
        test = folded.filter(F.col("fold") == fold).drop("fold")
        model = train_relevance(train, **pipeline_kwargs)
        metrics = confusion_metrics(model.transform(test)).first().asDict()
        metrics["fold"] = fold
        results.append(metrics)
    return results


def grid_search(
    df: DataFrame,
    key_col: str,
    param_grid: list[dict] | None = None,
    n_folds: int = 2,
) -> dict:
    """M8 — hyperparameter tuning (ref: src/models/trainer_optuna.py:14-120):
    the Optuna trial loop becomes a deterministic grid over the MLlib
    estimator params, each trial evaluated with hash-fold CV; best trial by
    mean F1.  (Optuna-style pruning is a driver-side concern — each trial is
    already a Spark job.)"""
    param_grid = param_grid or [
        {"num_features": 1 << 12, "max_iter": 10},
        {"num_features": 1 << 14, "max_iter": 10},
    ]
    best = None
    for params in param_grid:
        folds = cross_validate(df, key_col, n_folds=n_folds, **params)
        mean_f1 = sum(f["f1"] for f in folds) / len(folds)
        trial = {"params": params, "mean_f1": mean_f1, "folds": folds}
        if best is None or mean_f1 > best["mean_f1"]:
            best = trial
    return best


def successive_halving_search(
    df: DataFrame,
    key_col: str,
    param_grid: list[dict] | None = None,
    n_folds: int = 2,
    eta: int = 2,
    start_fraction: float = 0.25,
) -> dict:
    """M8 with pruning — the Optuna-trial-pruning semantics the reference
    uses (trainer_optuna.py:14-120: trials that look bad on dev accuracy are
    stopped early) expressed as successive halving:

    - every trial first trains on a small deterministic data slice
      (hash-bucketed on ``key_col`` — reproducible under any partitioning);
    - only the top ``1/eta`` of trials survive each rung; the data slice
      grows by ``eta`` per rung;
    - only the surviving trials are ever evaluated at full resource.

    So, like Optuna's pruner, most of the grid never pays full training
    cost.  Returns the best trial plus the rung history and the pruned
    params (observable by tests/telemetry).
    """
    import math

    param_grid = param_grid or [
        {"num_features": 1 << 10, "max_iter": 5},
        {"num_features": 1 << 12, "max_iter": 5},
        {"num_features": 1 << 12, "max_iter": 10},
        {"num_features": 1 << 14, "max_iter": 10},
    ]
    survivors = [{"params": p} for p in param_grid]
    pruned: list[dict] = []
    rungs: list[dict] = []
    fraction = start_fraction

    def evaluate(trials: list[dict], frac: float) -> None:
        sliced = (
            df
            if frac >= 1.0
            else df.filter(bucket_of(F.col(key_col), 1000, salt="shalving") < int(frac * 1000))
        )
        for t in trials:
            folds = cross_validate(sliced, key_col, n_folds=n_folds, **t["params"])
            t["mean_f1"] = sum(f["f1"] for f in folds) / len(folds)
            t["folds"] = folds

    rung = 0
    while len(survivors) > 1 and fraction < 1.0:
        evaluate(survivors, fraction)
        rungs.append({"rung": rung, "fraction": fraction, "n_trials": len(survivors)})
        survivors.sort(key=lambda t: -t["mean_f1"])
        keep = max(1, math.ceil(len(survivors) / eta))
        pruned.extend(t["params"] for t in survivors[keep:])
        survivors = survivors[:keep]
        fraction = min(1.0, fraction * eta)
        rung += 1

    evaluate(survivors, 1.0)  # full-resource evaluation on survivors only
    rungs.append({"rung": rung, "fraction": 1.0, "n_trials": len(survivors)})
    best = max(survivors, key=lambda t: t["mean_f1"])
    return {
        "params": best["params"],
        "mean_f1": best["mean_f1"],
        "folds": best["folds"],
        "rungs": rungs,
        "n_trials": len(param_grid),
        "n_full_evaluations": len(survivors),
        "pruned": pruned,
    }


def _tpe_u(seed: str, *parts) -> float:
    """Deterministic uniform draw in [0, 1) from an md5 stream — the
    reproducible stand-in for Optuna's RNG (every run of the search with the
    same seed proposes the same trials)."""
    import hashlib

    h = hashlib.md5("|".join([seed, *[str(p) for p in parts]]).encode()).hexdigest()
    return int(h[:8], 16) / 16**8


def tpe_search(
    space: dict,
    objective,
    n_trials: int = 12,
    n_startup: int = 4,
    gamma: float = 0.25,
    n_candidates: int = 24,
    seed: str = "tpe",
) -> dict:
    """M8 — the Optuna TPE sampling loop (ref: src/models/trainer_optuna.py
    uses optuna's default TPESampler to propose each trial's hyperparams),
    re-expressed as a deterministic Tree-structured Parzen Estimator
    (Bergstra et al. 2011, "Algorithms for Hyper-Parameter Optimization"):

    - first ``n_startup`` trials: quasi-random draws from the prior;
    - afterwards: split history at the top-``gamma`` quantile into good l(x)
      and bad g(x) observations, fit a Parzen mixture to each (triangular
      kernels for numeric dims, smoothed counts for choices), draw
      ``n_candidates`` from l(x), and run the candidate maximizing the
      acquisition ratio l(x)/g(x);
    - every draw comes from an md5 stream keyed by (seed, trial, dim), so
      the whole search is reproducible — no RNG state, no optuna dependency.

    ``space`` maps each param name to ("uniform", lo, hi),
    ("loguniform", lo, hi), ("int", lo, hi) or ("choice", [values]).
    ``objective(params) -> float`` is MAXIMIZED; each call is expected to
    launch whatever distributed evaluation the trial needs (e.g.
    ``cross_validate`` / ``finetune_qa`` — the search loop itself is
    driver-side orchestration exactly as in the reference, where each optuna
    trial wrapped a full FARM training run).

    Returns {"params", "score", "trials": [{params, score}, ...]}.
    """
    import math

    def _prior_draw(trial: int, name: str, spec) -> object:
        u = _tpe_u(seed, "prior", trial, name)
        kind = spec[0]
        if kind == "choice":
            return spec[1][int(u * len(spec[1])) % len(spec[1])]
        lo, hi = float(spec[1]), float(spec[2])
        if kind == "loguniform":
            v = math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
        else:
            v = lo + u * (hi - lo)
        return int(round(v)) if kind == "int" else v

    def _kde(value: float, centers: list[float], lo: float, hi: float) -> float:
        # Parzen mixture of triangular kernels; bandwidth shrinks as
        # observations accumulate (simple 1/sqrt(n) rule)
        bw = max((hi - lo) / math.sqrt(len(centers) + 1), 1e-12)
        dens = 0.0
        for c in centers:
            d = abs(value - c)
            if d < bw:
                dens += (1 - d / bw) / bw
        # +prior mass so unseen regions keep nonzero density
        return dens / len(centers) + 1e-9 / (hi - lo + 1e-12)

    def _propose(trial: int, name: str, spec, good: list, bad: list) -> object:
        kind = spec[0]
        if kind == "choice":
            values = spec[1]
            g_counts = {v: 1.0 for v in values}
            b_counts = {v: 1.0 for v in values}
            for v in good:
                g_counts[v] += 1
            for v in bad:
                b_counts[v] += 1
            g_tot = sum(g_counts.values())
            best_v, best_r = None, -1.0
            for i in range(n_candidates):
                u = _tpe_u(seed, "cand", trial, name, i) * g_tot
                acc = 0.0
                pick = values[-1]
                for v in values:
                    acc += g_counts[v]
                    if u < acc:
                        pick = v
                        break
                r = (g_counts[pick] / g_tot) / (b_counts[pick] / sum(b_counts.values()))
                if r > best_r:
                    best_v, best_r = pick, r
            return best_v
        lo, hi = float(spec[1]), float(spec[2])
        log_scale = kind == "loguniform"
        tx = (lambda v: math.log(v)) if log_scale else (lambda v: v)
        itx = (lambda v: math.exp(v)) if log_scale else (lambda v: v)
        t_lo, t_hi = tx(lo), tx(hi)
        g_centers = [tx(v) for v in good] or [(t_lo + t_hi) / 2]
        b_centers = [tx(v) for v in bad] or [(t_lo + t_hi) / 2]
        bw = max((t_hi - t_lo) / math.sqrt(len(g_centers) + 1), 1e-12)
        best_v, best_r = None, -1.0
        for i in range(n_candidates):
            u1 = _tpe_u(seed, "center", trial, name, i)
            u2 = _tpe_u(seed, "offset", trial, name, i)
            c = g_centers[int(u1 * len(g_centers)) % len(g_centers)]
            v = min(t_hi, max(t_lo, c + (u2 - 0.5) * 2 * bw))
            r = _kde(v, g_centers, t_lo, t_hi) / _kde(v, b_centers, t_lo, t_hi)
            if r > best_r:
                best_v, best_r = v, r
        out = itx(best_v)
        return int(round(out)) if kind == "int" else out

    trials: list[dict] = []
    for t in range(n_trials):
        if t < n_startup or len(trials) < 2:
            params = {n: _prior_draw(t, n, s) for n, s in space.items()}
        else:
            ranked = sorted(trials, key=lambda r: -r["score"])
            n_good = max(1, math.ceil(gamma * len(ranked)))
            good_t, bad_t = ranked[:n_good], ranked[n_good:]
            params = {
                n: _propose(
                    t, n, s,
                    [r["params"][n] for r in good_t],
                    [r["params"][n] for r in bad_t] or [r["params"][n] for r in good_t],
                )
                for n, s in space.items()
            }
        trials.append({"params": params, "score": float(objective(params))})
    best = max(trials, key=lambda r: r["score"])
    return {"params": best["params"], "score": best["score"], "trials": trials}


# --- M6: transformer QA fine-tuning -----------------------------------------
# The reference's largest component is a FARM/transformer fine-tune
# (ref: /root/reference/src/models/farm_trainer.py:26-432 — AdamW + linear
# warmup with ratio 0.1, farm_trainer.py:188-214; QA variant
# qa_farm_trainer.py:21-200).  The Spark-native expression is data-parallel
# parameter averaging (local SGD / FedAvg shape): each round the current
# model state broadcasts to executors, every partition runs real
# forward/backward steps over its Arrow batches, and the driver averages the
# per-partition states weighted by example count.  The loop below is that
# real path — it is backend-agnostic, so tests drive it end-to-end with a
# deterministic arithmetic backend, and ``hf_qa_finetune_backend`` supplies
# the transformers/torch implementation behind the same try-import gate as
# operators/inference.py:load_hf_checkpoint.


class FineTuneBackend:
    """Contract for ``finetune_qa`` backends.

    - ``init_state() -> bytes``: serialized initial model state.
    - ``train_step(state: bytes, pdf: pandas.DataFrame) -> (bytes, float)``:
      run optimizer steps over one Arrow batch, return (new state,
      summed loss).  Executes executor-side; must be self-contained.
    - ``average_states(states: list[bytes], weights: list[int]) -> bytes``:
      example-count-weighted average of partition states (driver-side
      fallback path; only used when ``merge_states`` is absent).
    - ``merge_states(s1: bytes, w1: int, s2: bytes, w2: int) -> bytes``
      (optional): ASSOCIATIVE pairwise combine of two partial states; the
      result represents weight ``w1 + w2``.  When present, ``finetune_qa``
      tree-reduces partition states on the executors and the driver
      receives ONE merged state per epoch instead of one per partition —
      with real transformer weights (0.5-1.5 GB each) this is the
      difference between a scalable parameter-server step and a driver
      OOM at high partition counts.
    - ``finalize_state(state: bytes) -> bytes`` (optional): applied once
      at the driver after the tree reduce (e.g. turn accumulated
      sufficient statistics into parameters).  Contract:
      ``average_states(states, ws) == finalize_state(tree-merge(states))``.
    """


def hf_qa_finetune_backend(
    checkpoint: str, lr: float = 2e-5, modules: tuple | None = None
):
    """The real transformer backend (try-import gated like S1's pdfminer and
    S12's ``load_hf_checkpoint``): AutoModelForQuestionAnswering + AdamW,
    mirroring the reference's optimizer setup (farm_trainer.py:188-214).
    Raises the inference module's ``ModelLoadError`` with the actionable
    cause when transformers/torch are absent (this container); pass
    ``modules=(transformers, torch)`` to inject stand-ins under test.
    """
    from .operators.inference import ModelLoadError

    if modules is None:
        try:
            import torch
            import transformers
        except ImportError as exc:  # pragma: no cover - runtime-dependent
            raise ModelLoadError(
                f"cannot fine-tune from checkpoint {checkpoint!r}: the "
                "'transformers'/'torch' runtime is not installed in this "
                "environment; install them on the executors or use the "
                "deterministic test backend"
            ) from exc
    else:
        transformers, torch = modules

    import io

    class _HFBackend:
        def _build(self):
            tok = transformers.AutoTokenizer.from_pretrained(checkpoint)
            model = transformers.AutoModelForQuestionAnswering.from_pretrained(checkpoint)
            return tok, model

        def init_state(self) -> bytes:
            _, model = self._build()
            buf = io.BytesIO()
            torch.save(model.state_dict(), buf)
            return buf.getvalue()

        def train_step(self, state: bytes, pdf: pd.DataFrame) -> tuple[bytes, float]:
            tok, model = self._build()
            model.load_state_dict(torch.load(io.BytesIO(state)))
            model.train()
            opt = torch.optim.AdamW(model.parameters(), lr=lr)
            enc = tok(
                list(pdf["question"]),
                list(pdf["context"]),
                truncation=True,
                padding=True,
                return_tensors="pt",
            )
            out = model(
                **enc,
                start_positions=torch.tensor(list(pdf["start_position"])),
                end_positions=torch.tensor(list(pdf["end_position"])),
            )
            out.loss.backward()
            opt.step()
            opt.zero_grad()
            buf = io.BytesIO()
            torch.save(model.state_dict(), buf)
            return buf.getvalue(), float(out.loss)

        def average_states(self, states: list[bytes], weights: list[int]) -> bytes:
            dicts = [torch.load(io.BytesIO(s)) for s in states]
            total = sum(weights)
            avg = {
                k: sum(d[k] * (w / total) for d, w in zip(dicts, weights))
                for k in dicts[0]
            }
            buf = io.BytesIO()
            torch.save(avg, buf)
            return buf.getvalue()

        def merge_states(self, s1: bytes, w1: int, s2: bytes, w2: int) -> bytes:
            # pairwise weighted mean — associative for weighted averaging
            # (up to float rounding), so the tree reduce never ships more
            # than two states to any single task
            d1 = torch.load(io.BytesIO(s1))
            d2 = torch.load(io.BytesIO(s2))
            total = w1 + w2
            avg = {k: d1[k] * (w1 / total) + d2[k] * (w2 / total) for k in d1}
            buf = io.BytesIO()
            torch.save(avg, buf)
            return buf.getvalue()

    return _HFBackend()


def arithmetic_qa_backend():
    """Deterministic single-parameter backend for exercising the
    ``finetune_qa`` loop without a transformer runtime (the same role the
    stub scorer plays for M1/M2 inference): the "model" is one integer
    parameter ``w_milli`` fit to the mean of ``start_position`` by exact
    per-partition sufficient statistics.

    Every quantity is integer (loss = Σ (sp*1000 − w_milli)², the mean via
    exact integer sums, w_milli = floor(mean*1000 + 0.5)), so the loop's
    output is bit-identical under ANY partitioning and reproducible in
    ANSI SQL — which is what lets the M6 dataflow be oracle-checked, not
    just smoke-tested.  Weighted state averaging over exact partition sums
    equals the global solution exactly, so partition boundaries cannot
    leak into results.
    """
    import pickle

    class _ArithmeticBackend:
        def init_state(self) -> bytes:
            return pickle.dumps({"w_milli": 0, "acc_sum": 0, "acc_n": 0})

        def train_step(self, state: bytes, pdf: pd.DataFrame) -> tuple[bytes, float]:
            s = pickle.loads(state)
            sp = [int(v) for v in pdf["start_position"]]
            w = s["w_milli"]
            loss = sum((v * 1000 - w) ** 2 for v in sp)
            s["acc_sum"] += sum(sp)
            s["acc_n"] += len(sp)
            return pickle.dumps(s), float(loss)

        def average_states(self, states: list[bytes], weights: list[int]) -> bytes:
            import math

            dicts = [pickle.loads(s) for s in states]
            total_sum = sum(d["acc_sum"] for d in dicts)
            total_n = sum(d["acc_n"] for d in dicts)
            w_milli = int(math.floor(total_sum / total_n * 1000 + 0.5)) if total_n else 0
            return pickle.dumps({"w_milli": w_milli, "acc_sum": 0, "acc_n": 0})

        def merge_states(self, s1: bytes, w1: int, s2: bytes, w2: int) -> bytes:
            # integer sufficient statistics add exactly — associative, so
            # the tree-merged result is bit-identical to average_states
            d1, d2 = pickle.loads(s1), pickle.loads(s2)
            return pickle.dumps(
                {
                    "w_milli": d1["w_milli"],
                    "acc_sum": d1["acc_sum"] + d2["acc_sum"],
                    "acc_n": d1["acc_n"] + d2["acc_n"],
                }
            )

        def finalize_state(self, state: bytes) -> bytes:
            import math

            d = pickle.loads(state)
            total_sum, total_n = d["acc_sum"], d["acc_n"]
            w_milli = int(math.floor(total_sum / total_n * 1000 + 0.5)) if total_n else 0
            return pickle.dumps({"w_milli": w_milli, "acc_sum": 0, "acc_n": 0})

    return _ArithmeticBackend()


def finetune_qa(
    train_df: DataFrame,
    backend,
    epochs: int = 2,
    feature_cols: list[str] | None = None,
    allow_driver_merge: bool = False,
) -> dict:
    """M6 — distributed QA fine-tune via per-epoch parameter averaging.

    Each epoch: broadcast the current state into a ``mapInPandas`` stage
    that runs ``backend.train_step`` over every Arrow batch of its
    partition and emits ONE (state, n_examples, loss_sum) row per
    partition.  Backends exposing ``merge_states`` (both shipped backends
    do) then tree-reduce those partial states ON THE EXECUTORS — depth
    scaled to log2(partitions), so no task and not the driver ever holds
    more than two states at once, and the driver receives exactly ONE
    merged state per epoch regardless of partition count.  With real
    transformer weights (0.5-1.5 GB per state) a per-partition driver
    collect would be the scalability wall; the tree keeps the
    parameter-server step O(state_size) at the driver.  Legacy backends
    without ``merge_states`` are REFUSED by default — the per-partition
    collect + ``average_states`` path ships partition_count x state_size
    bytes to the driver, a silent scalability wall with real transformer
    weights; pass ``allow_driver_merge=True`` to opt into it knowingly
    (small states / few partitions only).

    Returns {"state": bytes, "loss_history": [per-epoch mean loss],
    "loss_sums": [per-epoch summed loss], "n_examples": int}.
    Deterministic for deterministic backends: the epoch loop is sequential
    and exact-integer merges are order-independent (the arithmetic
    backend's tree result is bit-identical to ``average_states``).
    """
    import math as math_mod
    import pandas as pd_mod
    from pyspark.sql.types import (
        BinaryType,
        DoubleType as _D,
        LongType,
        StructField,
        StructType,
    )

    cols = feature_cols or ["question", "context", "start_position", "end_position"]
    data = train_df.select(*cols)
    schema = StructType(
        [
            StructField("state", BinaryType()),
            StructField("n", LongType()),
            StructField("loss_sum", _D()),
        ]
    )
    state = backend.init_state()
    history: list[float] = []
    loss_sums: list[float] = []
    n_total = 0
    for _ in range(epochs):
        current = state

        def run_partition(batches, _state=current):
            n = 0
            loss = 0.0
            s = _state
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                s, batch_loss = backend.train_step(s, pdf)
                n += len(pdf)
                loss += batch_loss
            if n:
                yield pd_mod.DataFrame({"state": [s], "n": [n], "loss_sum": [loss]})

        partials = data.mapInPandas(run_partition, schema=schema)
        if hasattr(backend, "merge_states"):
            # executor-side tree reduction: depth ~ log2(P) keeps every
            # combine binary, so the driver's final reduce sees <= 2
            # partials and ships home exactly one state
            rdd = partials.rdd.map(lambda r: (bytes(r.state), int(r.n), float(r.loss_sum)))
            n_parts = max(rdd.getNumPartitions(), 2)
            depth = max(2, int(math_mod.ceil(math_mod.log2(n_parts))))

            def _comb(a, b, _merge=backend.merge_states):
                return (_merge(a[0], a[1], b[0], b[1]), a[1] + b[1], a[2] + b[2])

            try:
                merged, n_total, epoch_sum = rdd.treeReduce(_comb, depth=depth)
            except ValueError:  # empty input — no partition emitted a state
                break
            state = (
                backend.finalize_state(merged)
                if hasattr(backend, "finalize_state")
                else merged
            )
        else:  # legacy contract: per-partition driver collect (opt-in)
            if not allow_driver_merge:
                raise ValueError(
                    "finetune backend defines no merge_states: the fallback "
                    "is a per-partition driver collect whose driver traffic "
                    "scales with partition count x state size — define "
                    "merge_states/finalize_state for the executor-side tree "
                    "reduction, or pass allow_driver_merge=True to accept "
                    "the collect knowingly (small states / few partitions "
                    "only; never with real transformer weights)"
                )
            rows = partials.collect()
            if not rows:
                break
            states = [bytes(r.state) for r in rows]
            weights = [r.n for r in rows]
            state = backend.average_states(states, weights)
            n_total = sum(weights)
            epoch_sum = sum(r.loss_sum for r in rows)
        loss_sums.append(epoch_sum)
        history.append(epoch_sum / max(n_total, 1))
    return {
        "state": state,
        "loss_history": history,
        "loss_sums": loss_sums,
        "n_examples": n_total,
    }


def span_overlap_f1(pred: str, gold: str) -> float:
    """M9 — relaxed span-overlap F1 between a predicted and gold answer
    (token-level overlap, the SQuAD metric core; qa_metrics.py:8-81)."""
    p_toks = pred.split() if pred else []
    g_toks = gold.split() if gold else []
    if not p_toks and not g_toks:
        return 1.0
    if not p_toks or not g_toks:
        return 0.0
    common = 0
    g_counts: dict[str, int] = {}
    for t in g_toks:
        g_counts[t] = g_counts.get(t, 0) + 1
    for t in p_toks:
        if g_counts.get(t, 0) > 0:
            common += 1
            g_counts[t] -= 1
    if common == 0:
        return 0.0
    precision = common / len(p_toks)
    recall = common / len(g_toks)
    return 2 * precision * recall / (precision + recall)


@F.pandas_udf(DoubleType())
def span_f1_udf(pred: pd.Series, gold: pd.Series) -> pd.Series:
    return pd.Series([span_overlap_f1(p, g) for p, g in zip(pred, gold)])


def qa_eval(scored: DataFrame, pred_col: str = "final_answer", gold_col: str = "gold_answer") -> DataFrame:
    """M9 — corpus-level QA evaluation: exact match + mean span-overlap F1,
    with the answerable/unanswerable breakdown
    (qa_metrics.py:44-81 shape).  Span F1 runs as a pandas UDF."""
    em = (F.col(pred_col) == F.col(gold_col)).cast("double")
    answerable = (F.col(gold_col) != "no_answer").alias("answerable")
    return (
        scored.withColumn("em", em)
        .withColumn("span_f1", span_f1_udf(F.col(pred_col), F.col(gold_col)))
        .withColumn("answerable", answerable)
        .groupBy("answerable")
        .agg(
            F.round(F.avg("em"), 6).alias("exact_match"),
            F.round(F.avg("span_f1"), 6).alias("mean_f1"),
            F.count(F.lit(1)).alias("n"),
        )
    )
