from __future__ import annotations

from aicoe_osc_demo_spark.pipelines import squad_curation_pipeline, text_curation_pipeline


def _fixtures(spark):
    annotations = spark.createDataFrame(
        [
            # normal: 2 paragraphs zip to 2 pages (1-based)
            ("Acme", "acme,pdf", "k1", 2020, "TEXT", [2, 3],
             '["emissions fell sharply", "scope one was reported"]'),
            # single page broadcasts; year rewrite applies via add_year
            ("Beta", "beta.pdf", "k2", 2021, "TEXT", [1],
             '["capex rose", "opex fell"]'),
            # filtered out: wrong data_type
            ("Gamma", "gamma.pdf", "k1", 2020, "TABLE", [1], '["x"]'),
            # filtered out: excluded company
            ("Tmpl", "tmpl.pdf", "k1", 2020, "TEXT", [1], '["y"]'),
            # filtered out: unparseable paragraph list
            ("Acme", "acme.pdf", "k1", 2020, "TEXT", [1], "not a list"),
        ],
        ["company", "source_file", "kpi_id", "year", "data_type", "source_page",
         "relevant_paragraphs"],
    )
    paragraphs = spark.createDataFrame(
        [
            ("acme.pdf", 0, "intro text nobody annotated"),
            ("acme.pdf", 5, "another unannotated paragraph"),
            ("beta.pdf", 7, "spare beta content here"),
        ],
        ["pdf_name", "page", "paragraph"],
    )
    kpi = spark.createDataFrame(
        [("k1", "What is scope one?", False), ("k2", "What is capex?", True)],
        ["kpi_id", "question", "add_year"],
    )
    return annotations, paragraphs, kpi


def test_text_curation_pipeline(spark):
    annotations, paragraphs, kpi = _fixtures(spark)
    out = text_curation_pipeline(
        spark, annotations, paragraphs, kpi, excluded_companies=["Tmpl"], neg_pos_ratio=1
    )
    rows = out.collect()
    pos = {(r.question, r.context) for r in rows if r.label == 1}
    neg = {(r.question, r.context) for r in rows if r.label == 0}
    # both acme paragraphs survive, zipped to their pages
    assert ("What is scope one?", "emissions fell sharply") in pos
    assert ("What is scope one?", "scope one was reported") in pos
    # add_year rewrote the k2 question; both beta paragraphs broadcast page 1
    assert ("What is capex in year 2021?", "capex rose") in pos
    assert ("What is capex in year 2021?", "opex fell") in pos
    # excluded/TABLE/unparseable rows contributed nothing
    assert not any("x" == c or "y" == c for _, c in pos)
    # one hash-picked negative per distinct question, drawn from the pool
    assert len(neg) == 2
    pool_texts = {
        "intro text nobody annotated",
        "another unannotated paragraph",
        "spare beta content here",
    }
    assert all(c in pool_texts for _, c in neg)
    # deterministic under repartitioning
    again = text_curation_pipeline(
        spark,
        annotations.repartition(7),
        paragraphs.repartition(3),
        kpi,
        excluded_companies=["Tmpl"],
        neg_pos_ratio=1,
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_table_curation_pipeline(spark):
    from aicoe_osc_demo_spark.pipelines import table_curation_pipeline

    annotations = spark.createDataFrame(
        [("Acme", "acme.pdf", 1, "k1", "total emissions 500", "TABLE"),
         ("Acme", "acme.pdf", 1, "k2", "text answer", "TEXT")],  # filtered out
        ["company", "source_file", "source_page", "kpi_id", "answer", "data_type"],
    )
    tables = spark.createDataFrame(
        [
            ("acme.pdf", 0, 0, [["total emissions", "500"], ["2020", "400"]]),
            ("acme.pdf", 0, 1, [["unrelated", "content"]]),
            ("acme.pdf", 3, 0, [["other page", "table"]]),
        ],
        ["pdf_name", "page", "table_index", "cells"],
    )
    out = table_curation_pipeline(spark, annotations, tables, neg_pos_ratio=1).collect()
    pos = [r for r in out if r.label == 1]
    neg = [r for r in out if r.label == 0]
    # argmax fuzzy match picked the emissions table on the annotated page
    assert len(pos) == 1 and "total emissions" in pos[0].table_text
    # one hash-picked negative from the non-positive pool
    assert len(neg) == 1 and "total emissions" not in neg[0].table_text


def test_nq_curation_pipeline(spark):
    from aicoe_osc_demo_spark.pipelines import nq_curation_pipeline

    filler = " ".join(f"w{i}" for i in range(30))
    nq = spark.createDataFrame(
        [
            ("q1", f"<p>answer one {filler}</p>", 1),
            ("q2", f"<p>answer two {filler}</p>", 1),
            ("q3", f"<Table>skip</Table> {filler}", 1),  # table doc dropped
            ("q4", "too short", 1),                       # length-gated
        ],
        ["question", "doc", "label"],
    )
    out = nq_curation_pipeline(spark, nq).collect()
    qs = {r.question for r in out}
    assert "q3" not in qs and "q4" not in qs
    # balanced: every surviving question has both labels
    by_q = {}
    for r in out:
        by_q.setdefault(r.question, set()).add(r.label)
    assert all(labels == {0, 1} for labels in by_q.values())
    assert len(by_q) >= 1
    # negatives are re-keyed from a different question's context
    for r in out:
        if r.label == 0:
            assert not r.context.startswith("answer " + r.question[-1])


def test_curator_dispatch_registry():
    from aicoe_osc_demo_spark.pipelines import CURATORS

    assert set(CURATORS) == {"text", "table", "squad", "nq"}


def test_squad_curation_pipeline(spark):
    examples = spark.createDataFrame(
        [
            ("f.pdf", "total was 42 tonnes", "What was total?", "e1", "42"),
            ("f.pdf", "42 leads this paragraph", "What leads?", "e2", "42"),
            ("f.pdf", "no number here", "What was total?", "e3", "42"),
        ],
        ["source_file", "context", "question", "example_id", "answer"],
    )
    train, dev = squad_curation_pipeline(spark, examples, train_frac=0.5)
    docs = train.collect() + dev.collect()
    contexts = {p.context: p.qas for d in docs for p in d.paragraphs}
    # unanswerable e3 dropped; e1 has the 42 at offset 10
    assert "no number here" not in contexts
    qas1 = {q.id: q for q in contexts["total was 42 tonnes"]}
    assert qas1["e1"].answers.answer_start == [10]
    # e2's 0-offset match triggered the FARM shift: space prepended, offset 1
    shifted = [c for c in contexts if c.startswith(" 42 leads")]
    assert shifted and {q.id for q in contexts[shifted[0]]} == {"e2"}
    assert contexts[shifted[0]][0].answers.answer_start == [1]
