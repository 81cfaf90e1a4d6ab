"""Unit tests for the JSONL source (sources/jsonl.py): PERMISSIVE
degradation semantics, torn-line determinism, and the FAILFAST contrast."""

from __future__ import annotations

import pytest

from apmbackend_spark.sources.jsonl import (
    CORRUPT_EVERY,
    JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)


@pytest.fixture()
def delivery(spark, tmpdir):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", f"src{i % 3}", 10 + i) for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmpdir / "delivery")
    write_jsonl(docs, out)
    return out


def test_permissive_read_accounts_torn_lines(spark, delivery):
    back = read_jsonl(spark, delivery)
    rows = back.collect()
    assert len(rows) == 30
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    ok = [r for r in rows if r["_corrupt_record"] is None]
    assert len(corrupt) == len([i for i in range(30) if i % CORRUPT_EVERY == 0])
    # torn rows: every typed field NULL, raw line preserved and unterminated
    for r in corrupt:
        assert r["doc_id"] is None and r["lang"] is None
        assert r["_corrupt_record"].startswith('{"doc_id":')
        assert not r["_corrupt_record"].endswith("}")
    # intact rows parse fully
    assert {r["doc_id"] for r in ok} == {
        i for i in range(30) if i % CORRUPT_EVERY != 0
    }
    assert all(r["n_chars"] == 10 + r["doc_id"] for r in ok)


def test_failfast_raises_on_torn_delivery(spark, delivery):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        (
            spark.read.schema(JSONL_SCHEMA.replace(", _corrupt_record string", ""))
            .option("mode", "FAILFAST")
            .json(delivery)
            .collect()
        )
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )
