"""PII redaction bank: per-category masking, single-attribution staging,
cross-engine (Java regex vs DuckDB RE2) agreement, and the curate()
pii_hits composition."""

import duckdb

from ragflow_spark.operators.curate import curate
from ragflow_spark.operators.pii import (
    PII_BANK,
    PII_FINAL_STAGE,
    PII_FINAL_TEXT,
    PII_HIT_COLS,
    pii_oracle_ctes,
    pii_scrub,
)

CASES = [
    # (text, expected per-category hits, expected scrubbed)
    ("contact bob@example.com now", {"email": 1},
     "contact <EMAIL> now"),
    ("a.b+tag@mail.co.uk and c_d%e@x.io", {"email": 2},
     "<EMAIL> and <EMAIL>"),
    ("host 10.0.5.1 ver 1.2.3.4", {"ip": 2},
     "host <IP> ver <IP>"),
    ("ssn 123-45-6789 ok", {"ssn": 1}, "ssn <SSN> ok"),
    ("card 4111 1111 1111 1111 / 4111-1111-1111-1111", {"card": 2},
     "card <CARD> / <CARD>"),
    ("call 555-123-4567 or (555) 123-4567 or +1 555-123-4567",
     {"phone": 3}, "call <PHONE> or <PHONE> or <PHONE>"),
    # negatives: dates, ranges, prices, digit-run tails stay untouched
    ("date 2026-08-17 range 100-200 price 1,234.56", {},
     "date 2026-08-17 range 100-200 price 1,234.56"),
    ("x123-45-67890 and 1234-56-7890", {},
     "x123-45-67890 and 1234-56-7890"),
    ("", {}, ""),
]


def test_bank_masks_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in
            pii_scrub(df, "doc_id", "text", keep_text=True).collect()}
    for i, (_, hits, scrubbed) in enumerate(CASES):
        r = rows[i]
        assert r["scrubbed"] == scrubbed, (i, r["scrubbed"])
        for name, _, _ in PII_BANK:
            assert r[f"{name}_hits"] == hits.get(name, 0), (i, name)
        assert r["pii_hits"] == sum(hits.values())


def test_single_attribution_staging(spark):
    """A span claimed by an earlier category never re-counts in a later
    one: the SSN's ddd-dd-dddd digits vanish before the phone rule runs,
    and an email's host dots never count as an IP."""
    df = spark.createDataFrame(
        [(0, "ssn 123-45-6789 tel 123-456-7890"),
         (1, "a@10.0.5.1.example.com raw 10.0.5.1")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            pii_scrub(df, "doc_id", "text", keep_text=True).collect()}
    assert rows[0]["ssn_hits"] == 1 and rows[0]["phone_hits"] == 1
    assert rows[0]["scrubbed"] == "ssn <SSN> tel <PHONE>"
    # the email rule eats the dotted host; only the raw quad counts as IP
    assert rows[1]["email_hits"] == 1 and rows[1]["ip_hits"] == 1
    assert rows[1]["scrubbed"] == "<EMAIL> raw <IP>"


def test_duckdb_twin_agrees(spark):
    """The exact bank, run by DuckDB's RE2 through the oracle CTE chain,
    masks the same spans and counts the same hits as Spark's Java regex —
    the contract the doc_pii_scrub correctness row rides on."""
    rows = [(i, t) for i, (t, _, _) in enumerate(CASES) if t]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           pii_scrub(df, "doc_id", "text", keep_text=True).collect()}

    con = duckdb.connect()
    con.execute(
        "create table p0 as select * from (values "
        + ", ".join(f"({i}, {t!r})" for i, t in rows)
        + ") as v(doc_id, text)"
    )
    sql = f"""with {pii_oracle_ctes("text")}
        select doc_id, {", ".join(PII_HIT_COLS)},
               {PII_FINAL_TEXT} as scrubbed
        from {PII_FINAL_STAGE}"""
    for rec in con.execute(sql).fetchall():
        doc_id, *hits, scrubbed = rec
        g = got[doc_id]
        assert scrubbed == g["scrubbed"], doc_id
        assert list(hits) == [g[c] for c in PII_HIT_COLS], doc_id


def test_curate_reports_pii_hits(spark):
    df = spark.createDataFrame(
        [(0, "a perfectly normal document with some readable words here "
             "mail me at bob@example.com or call 555-123-4567"),
         (1, "another normal document with different readable words here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curate(df, "doc_id", "text").collect()}
    assert out[0]["pii_hits"] == 2
    assert out[1]["pii_hits"] == 0
    # counting is an audit signal, not a gate: both docs keep
    assert out[0]["keep"] == 1 and out[1]["keep"] == 1


def test_plan_is_native_single_projection(spark):
    """No UDF, no exchange: the scrub must stay inside whole-stage
    codegen so it rides the scan at 100 TB."""
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    plan = pii_scrub(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
