"""Certify the multimodal decode step's format-detection branches with
synthetic magic-byte payloads (the parquet fixtures are all text, so the
oracle only ever sees the 'raw-text' fallback)."""

from __future__ import annotations

import pandas as pd

from iceberg_catalog_postgres_spark.llm.multimodal import _decode_batch, _sniff_format


def test_sniff_format_branches():
    assert _sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert _sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert _sniff_format(b"GIF89a") == "gif"
    assert _sniff_format(b"RIFF....WAVE") == "riff"
    assert _sniff_format(b"%PDF-1.7") == "pdf"
    assert _sniff_format(b"hello world") == "raw-text"
    assert _sniff_format(b"") == "raw-text"


def test_decode_batch_features():
    batch = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "payload": [b"abc abc", b"\xff\xd8\xff\x00\x10", b""],
        }
    )
    out = _decode_batch(batch)
    assert list(out.columns) == [
        "doc_id", "n_bytes", "fmt", "first_byte", "last_byte",
        "mean_byte", "n_spaces", "n_alpha",
    ]
    r1 = out.iloc[0]
    assert r1["n_bytes"] == 7
    assert r1["fmt"] == "raw-text"
    assert r1["first_byte"] == ord("a") and r1["last_byte"] == ord("c")
    assert r1["n_spaces"] == 1 and r1["n_alpha"] == 6
    assert abs(r1["mean_byte"] - round((2 * (97 + 98 + 99) + 32) / 7, 6)) < 1e-9
    r2 = out.iloc[1]
    assert r2["fmt"] == "jpeg" and r2["first_byte"] == 255 and r2["last_byte"] == 16
    r3 = out.iloc[2]
    assert r3["n_bytes"] == 0 and r3["first_byte"] == -1 and r3["last_byte"] == -1
    assert r3["mean_byte"] == 0.0 and r3["fmt"] == "raw-text"


def test_decode_batch_deterministic():
    batch = pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"), "payload": [b"xyz"]})
    a, b = _decode_batch(batch), _decode_batch(batch)
    pd.testing.assert_frame_equal(a, b)
