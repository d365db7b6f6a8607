from __future__ import annotations

import os

from pyspark.sql import functions as F

from aicoe_osc_demo_spark.pipelines import demo1_pipeline, inference_pipeline
from aicoe_osc_demo_spark.sources.extraction import (
    detect_tables,
    extract_table_cells,
    extract_text,
    run_folder,
)
from aicoe_osc_demo_spark.sources.files import read_annotation_workbooks, read_jsonl_chunked


def _write_fake_pdfs(tmp_path) -> str:
    d = tmp_path / "pdfs"
    os.makedirs(d)
    long_para = "climate disclosure paragraph with enough alphabetic characters to pass"
    (d / "a.pdf").write_bytes(
        f"{long_para} page zero\n\nshort\f{long_para} page one".encode()
    )
    (d / "b.pdf").write_bytes(f"{long_para} only page".encode())
    (d / "notes.txt").write_bytes(b"not a pdf")
    return str(d)


def test_extract_text_filters_and_pages(spark, tmp_path):
    pdf_dir = _write_fake_pdfs(tmp_path)
    out = run_folder(spark, pdf_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.pdf_name, []).append((r.page, r.paragraph))
    assert set(by_doc) == {"a.pdf", "b.pdf"}  # glob excluded notes.txt
    # short paragraph dropped (min 30 alpha chars), pages split on \f
    assert [p for p, _ in sorted(by_doc["a.pdf"])] == [0, 1]
    assert all("short" != t for _, t in by_doc["a.pdf"])


def test_run_folder_annotation_and_ledger_filters(spark, tmp_path):
    pdf_dir = _write_fake_pdfs(tmp_path)
    annotated = spark.createDataFrame([("a.pdf",)], ["pdf_name"])
    out = run_folder(spark, pdf_dir, annotated_names=annotated).collect()
    assert {r.pdf_name for r in out} == {"a.pdf"}  # S2 semi-join
    processed = spark.createDataFrame([("a.pdf",)], ["pdf_name"])
    out2 = run_folder(spark, pdf_dir, processed=processed).collect()
    assert {r.pdf_name for r in out2} == {"b.pdf"}  # P10 anti-join


def test_table_detection_and_cells(spark, tmp_path):
    pdf_dir = _write_fake_pdfs(tmp_path)
    paragraphs = extract_text(
        spark.read.format("binaryFile").option("pathGlobFilter", "*.pdf").load(pdf_dir)
    )
    boxes = detect_tables(paragraphs, score_threshold=0.0)
    assert boxes.count() > 0
    assert all(r.score >= 0.0 and r.x1 > r.x0 for r in boxes.collect())
    cells = extract_table_cells(paragraphs, boxes).collect()
    assert all(isinstance(r.cells[0], list) for r in cells)
    # deterministic stub: rerun produces identical boxes
    again = detect_tables(paragraphs, score_threshold=0.0).collect()
    assert sorted((r.pdf_name, r.page, r.score) for r in again) == sorted(
        (r.pdf_name, r.page, r.score) for r in boxes.collect()
    )


def test_inference_pipeline_end_to_end(spark, tmp_path):
    pdf_dir = _write_fake_pdfs(tmp_path)
    questions = spark.createDataFrame(
        [("k1", "What is the climate exposure?"), ("k2", "What is scope one?")],
        ["kpi_id", "question"],
    )
    out = inference_pipeline(spark, pdf_dir, questions, relevance_threshold=0.0, top_k=2)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"pdf_name", "kpi_id", "question", "page", "final_answer", "score"}
    # deterministic stub scorer → stable across runs
    again = inference_pipeline(spark, pdf_dir, questions, relevance_threshold=0.0, top_k=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_inference_results_published_as_table(spark, tmp_path):
    # §3.1 step 5 (create_results_table.ipynb): per-PDF results land as an
    # ORC SQL table; the demo2 Superset slice (count by answer) runs on it.
    pdf_dir = _write_fake_pdfs(tmp_path)
    questions = spark.createDataFrame([("k1", "What is exposure?")], ["kpi_id", "question"])
    out = inference_pipeline(spark, pdf_dir, questions, relevance_threshold=0.0, top_k=2)
    from aicoe_osc_demo_spark.sources.files import write_table

    write_table(out, "infer_kpi_results", fmt="orc", path=str(tmp_path / "results"))
    try:
        slice_df = spark.sql(
            "SELECT final_answer, COUNT(*) AS n FROM infer_kpi_results GROUP BY final_answer"
        )
        assert slice_df.count() > 0
        assert spark.table("infer_kpi_results").count() == out.count()
    finally:
        spark.sql("DROP TABLE infer_kpi_results")


def test_demo1_pipeline_join(spark):
    e1 = spark.createDataFrame(
        [("X1", 10.0), ("X2", 20.0)], ["ISIN Code", "Coverage S1!"]
    ).withColumnRenamed("ISIN Code", "isin")
    e2 = spark.createDataFrame([("X1", "A Corp"), ("X3", "B Corp")], ["isin", "Company Name"])
    joined = demo1_pipeline(spark, e1, e2)
    rows = {r.isin: r for r in joined.collect()}
    assert set(rows) == {"X1", "X3"}
    assert rows["X1"].coverage_s1 == 10.0
    assert rows["X3"].coverage_s1 is None  # left join preserves unmatched
    assert "isin" in joined.columns and joined.columns.count("isin") == 1


def test_annotation_workbooks_and_jsonl(spark, tmp_path):
    csv_dir = tmp_path / "ann"
    os.makedirs(csv_dir)
    (csv_dir / "annotator1.csv").write_text(
        "company,kpi_id,source_file\nAcme,1,a.pdf\n"
    )
    df = read_annotation_workbooks(
        spark, str(csv_dir), columns_to_read=["company", "kpi_id", "source_file"]
    )
    r = df.first()
    assert r.annotator == "annotator1.csv" and r.company == "Acme"

    jl = tmp_path / "nq.jsonl"
    jl.write_text('{"q": "what is esg", "doc": "<Table>x</Table> text"}\n{"q": "q2", "doc": "plain"}\n')
    nq = read_jsonl_chunked(spark, str(jl))
    assert nq.count() == 2
    assert nq.filter(F.col("doc").rlike("<Table>.*</Table>")).count() == 1


def test_detector_loading_path(monkeypatch):
    # the REAL loading path (S3): a non-"stub" spec routes through
    # load_detector_checkpoint and is cached once per spec
    from aicoe_osc_demo_spark.sources import extraction as ext

    class FakeDetector:
        def __init__(self, path):
            self.path = path

        def detect(self, name, page, payload):
            return [(0, 1.0, 2.0, 3.0, 4.0, 0.99)]

    loaded = []

    def fake_loader(path):
        loaded.append(path)
        return FakeDetector(path)

    monkeypatch.setattr(ext, "load_detector_checkpoint", fake_loader)
    ext._DETECTOR_CACHE.clear()
    try:
        d1 = ext._get_detector("/ckpt/cascadetabnet.ts")
        d2 = ext._get_detector("/ckpt/cascadetabnet.ts")
        assert isinstance(d1, FakeDetector) and d1 is d2
        assert loaded == ["/ckpt/cascadetabnet.ts"]
        assert isinstance(ext._get_detector("stub"), ext._StubDetector)
        assert d1.detect("a.pdf", 0, "x")[0][5] == 0.99
    finally:
        ext._DETECTOR_CACHE.clear()


def test_detector_loading_without_runtime_raises():
    # in a torch-less container the real path fails loud, not silent
    import pytest as _pytest

    from aicoe_osc_demo_spark.sources import extraction as ext

    try:
        import torch  # noqa: F401

        _pytest.skip("torch installed; loud-failure branch not reachable")
    except ImportError:
        pass
    with _pytest.raises(ext.DetectorLoadError, match="torch"):
        ext.load_detector_checkpoint("/ckpt/cascadetabnet.ts")
