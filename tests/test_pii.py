"""PII tagging/redaction on a crafted corpus, three-engine agreement:
the Spark operator, the registry's DuckDB oracle, and an independent
pure-Python ``re`` reference must all coincide. The sf corpora are
synthetic words (mostly zero PII), so the auto-parity run exercises the
sparse path; this is the real-signal test."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import Row

from concordium_transaction_logger_spark.operators import textstats
from concordium_transaction_logger_spark.registry import REGISTRY
from concordium_transaction_logger_spark.sources.tables import TABLES

TEXTS = [
    "contact John.Doe+spam@Example-Mail.co.uk or 123-45-6789 today",
    "call +4917212345678 or 030-555-0199 from 192.168.0.1",
    "plain text, no pii at all",
    # x@y.z is NOT an email (TLD needs >= 2 letters); +1234567 is the
    # shortest accepted international phone; 999-99-9999 is id-shaped
    "edge: a@bc.io x@y.z 999-99-9999 1.2.3.4 +1234567",
    # digit-dashed local part: counts as email AND phone in stats;
    # redaction order makes it an <EMAIL>, the later bare one a <PHONE>
    "mail 123-456-7890@host.com then bare 123-456-7890",
    "ip-ish 10.0.0.1:8080 and 256.300.1.2 still match the simple class",
    "",
]


@pytest.fixture()
def pii_sf(spark, tmp_path):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(TEXTS)
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


@pytest.fixture()
def pii_duck(pii_sf, sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        if name == "documents":
            # Spark writes a directory of part files; the driver's
            # testdata tables are single files
            pat = f"{pii_sf}/documents.parquet/*.parquet"
        else:
            pat = f"{sf_dir}/{name}.parquet"
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    yield con
    con.close()


def _python_counts(text: str) -> dict[str, int]:
    out = {}
    for name, pat, _ in textstats.PII_PATTERNS:
        out[f"n_{name}"] = len(re.findall(pat, text))
    out["n_pii"] = sum(out.values())
    return out


def _python_redact(text: str) -> str:
    for _, pat, marker in textstats.PII_PATTERNS:
        text = re.sub(pat, marker, text)
    return text


def test_pii_stats_three_engine_agreement(spark, pii_sf, pii_duck):
    got = {
        r["doc_id"]: {k: r[k] for k in r.asDict() if k != "doc_id"}
        for r in textstats.pii_stats(spark, pii_sf).collect()
    }
    want_py = {i: _python_counts(t) for i, t in enumerate(TEXTS)}
    assert got == want_py, "Spark vs python-re"

    rel = pii_duck.sql(REGISTRY["doc_pii_stats"].oracle)
    cols = rel.columns
    duck = {
        row[cols.index("doc_id")]: {
            c: row[cols.index(c)] for c in cols if c != "doc_id"
        }
        for row in rel.fetchall()
    }
    assert duck == want_py, "DuckDB vs python-re"
    # the crafted corpus must actually exercise every pattern
    totals = {k: sum(c[k] for c in want_py.values()) for k in next(iter(want_py.values()))}
    assert all(v > 0 for v in totals.values()), totals


def test_pii_redact_three_engine_agreement(spark, pii_sf, pii_duck):
    got = {
        r["doc_id"]: (r["clean_text"], r["changed"])
        for r in textstats.pii_redact(spark, pii_sf).collect()
    }
    want = {
        i: (_python_redact(t), _python_redact(t) != t) for i, t in enumerate(TEXTS)
    }
    assert got == want, "Spark vs python-re"

    rel = pii_duck.sql(REGISTRY["doc_pii_redact"].oracle)
    cols = rel.columns
    duck = {
        row[cols.index("doc_id")]: (
            row[cols.index("clean_text")],
            row[cols.index("changed")],
        )
        for row in rel.fetchall()
    }
    assert duck == want, "DuckDB vs python-re"
    # order contract: the digit-dashed local part became <EMAIL>, the
    # bare repeat a <PHONE>
    assert got[4][0] == "mail <EMAIL> then bare <PHONE>"
    assert all(marker not in got[2][0] for _, _, marker in textstats.PII_PATTERNS)


def test_source_pii_profile_matches_python(spark, pii_sf, pii_duck):
    rows = textstats.source_pii_profile(spark, pii_sf).collect()
    assert len(rows) == 1 and rows[0]["source"] == "s"
    counts = [_python_counts(t)["n_pii"] for t in TEXTS]
    assert rows[0]["n_docs"] == len(TEXTS)
    assert rows[0]["total_pii"] == sum(counts)
    assert rows[0]["docs_with_pii"] == sum(1 for c in counts if c > 0)
    # int(x + 0.5), not round(): both engines round half AWAY FROM ZERO
    # (DuckDB ROUND(62.5)=63), Python round() banker's-rounds to 62
    assert rows[0]["pii_doc_permille"] == int(
        1000.0 * sum(1 for c in counts if c > 0) / len(TEXTS) + 0.5
    )
    from concordium_transaction_logger_spark.registry import REGISTRY as REG

    rel = pii_duck.sql(REG["source_pii_profile"].oracle)
    assert rel.fetchall() == [tuple(rows[0])]
