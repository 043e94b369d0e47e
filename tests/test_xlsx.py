"""Dependency-free xlsx writer (MMBench submission format)."""

import zipfile

from merlin_tpu.utils.xlsx import (
    _col_name, read_xlsx, write_records_xlsx, write_xlsx)


def test_col_names():
    assert [_col_name(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == \
        ["A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]


def test_roundtrip(tmp_path):
    path = str(tmp_path / "out.xlsx")
    recs = [
        {"index": 1, "question": "What <is> this & that?",
         "prediction": "A", "A": "cat", "B": "dog"},
        {"index": 2, "question": "中文题目", "prediction": "B is right",
         "A": "x"},
    ]
    write_records_xlsx(path, recs)
    back = read_xlsx(path)
    assert back[0]["index"] == 1
    assert back[0]["question"] == "What <is> this & that?"
    assert back[1]["question"] == "中文题目"
    assert back[1]["prediction"] == "B is right"
    assert back[1].get("B") is None  # missing key -> empty cell


def test_valid_zip_structure(tmp_path):
    path = str(tmp_path / "s.xlsx")
    write_xlsx(path, [["a", 1.5], ["b", None]], header=["k", "v"])
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "xl/workbook.xml" in names
        assert "xl/worksheets/sheet1.xml" in names
        assert z.testzip() is None
    back = read_xlsx(path)
    assert back == [{"k": "a", "v": 1.5}, {"k": "b", "v": None}]
