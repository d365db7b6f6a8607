from __future__ import annotations

import os

from aicoe_osc_demo_spark.sources.kpi_mapping import load_kpi_mapping, questions_for_sector


def _write_csv(tmp_path) -> str:
    d = tmp_path / "kpi"
    os.makedirs(d)
    (d / "kpi_mapping.csv").write_text(
        "kpi_id,question,sectors,add_year,kpi_category\n"
        '0,What is the company name?,"OG, CM, CU",FALSE,TEXT\n'
        '2,What is the total volume of reserves?,OG,TRUE,"TEXT, TABLE"\n'
        "2.1,What is the volume of estimated proven reserves?,OG,TRUE,TABLE\n"
    )
    return str(d)


def test_load_kpi_mapping(spark, tmp_path):
    kpi = load_kpi_mapping(spark, _write_csv(tmp_path))
    rows = {r.kpi_id: r for r in kpi.collect()}
    # fractional kpi ids preserved (the reference floats its dict keys)
    assert set(rows) == {0.0, 2.0, 2.1}
    assert rows[0.0].sectors == ["OG", "CM", "CU"]
    assert rows[2.0].kpi_category == ["TEXT", "TABLE"]
    assert rows[2.0].add_year is True and rows[0.0].add_year is False


def test_questions_for_sector(spark, tmp_path):
    kpi = load_kpi_mapping(spark, _write_csv(tmp_path))
    # relevance_infer.py:36-46 — sector intersection + category gate
    qs = {r.kpi_id for r in questions_for_sector(kpi, ["OG"], "TEXT").collect()}
    assert qs == {0.0, 2.0}  # 2.1 is TABLE-only
    qs_cm = {r.kpi_id for r in questions_for_sector(kpi, ["CM"], "TEXT").collect()}
    assert qs_cm == {0.0}
