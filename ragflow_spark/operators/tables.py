"""Table template as native DataFrame operators (SURVEY §2.6 C6: rag/app/
table.py's pandas column typing is the one chunk template that maps to real
relational ops rather than an in-UDF algorithm).

Models rag/app/table.py:89-123 (``column_data_type`` + ``trans_datatime``
family): each string column gets a type vote — integer / float / datetime /
text — over its non-empty values; the winning type drives a cast. Here the
vote is ONE whole-table aggregation (map-side combined, single shuffle) and
the casts are Catalyst expressions, so typing a 100 TB table costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_INT_RE = r"^\s*-?[0-9]+\s*$"
_FLOAT_RE = r"^\s*-?[0-9]*\.[0-9]+([eE][-+]?[0-9]+)?\s*$"
_DATE_RE = r"^\s*[0-9]{4}[-/][0-9]{1,2}[-/][0-9]{1,2}"


def column_type_votes(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: non-empty count and per-type match counts plus
    the winning ``inferred_type`` (tie order: int > float > datetime > text,
    majority threshold 0.5 of non-empty values as in the reference's
    ``counts.most_common`` dominance check)."""
    cols = cols or [c for c, t in df.dtypes if t == "string"]
    aggs = []
    for c in cols:
        v = F.col(c)
        nonempty = F.sum(
            F.when(v.isNotNull() & (F.trim(v) != ""), 1).otherwise(0)
        ).alias(f"__n_{c}")
        aggs.extend([
            nonempty,
            F.sum(F.when(v.rlike(_INT_RE), 1).otherwise(0)).alias(f"__i_{c}"),
            F.sum(F.when(v.rlike(_FLOAT_RE), 1).otherwise(0)).alias(f"__f_{c}"),
            F.sum(F.when(v.rlike(_DATE_RE), 1).otherwise(0)).alias(f"__d_{c}"),
        ])
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __i_{c}, __f_{c}, __d_{c}" for c in cols
    )
    long = one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nonempty, n_int, n_float, n_date)"
    )
    half = F.col("n_nonempty") / 2
    return long.withColumn(
        "inferred_type",
        F.when(F.col("n_nonempty") == 0, "text")
        .when(F.col("n_int") > half, F.lit("integer"))
        .when(F.col("n_int") + F.col("n_float") > half, F.lit("float"))
        .when(F.col("n_date") > half, F.lit("datetime"))
        .otherwise(F.lit("text")),
    )


def apply_inferred_types(df: DataFrame, votes: DataFrame) -> DataFrame:
    """Cast each column to its inferred type. ``votes`` is tiny (one row per
    column) and is collected — a driver-side collect bounded by the table's
    COLUMN count (tens), never its row count; the casts themselves stay
    lazy/Catalyst."""
    mapping = {r["column"]: r["inferred_type"] for r in votes.collect()}
    out = df
    for c, t in mapping.items():
        if t == "integer":
            out = out.withColumn(c, F.col(c).cast("long"))
        elif t == "float":
            out = out.withColumn(c, F.col(c).cast("double"))
        elif t == "datetime":
            out = out.withColumn(c, F.to_timestamp(F.col(c)))
    return out


def table_rows_to_text(df: DataFrame, cols: list[str] | None = None,
                       eng: bool = True) -> DataFrame:
    """Render typed rows back to the reference's natural-language row form
    (``header：value; …``, tokenize_table's join — rag/nlp/__init__.py:
    266-288) as a ``row_text`` column. Pure concat_ws/Catalyst."""
    cols = cols or df.columns
    sep = "; " if eng else "； "
    parts = [
        F.when(
            F.col(c).isNotNull(),
            F.concat(F.lit(f"{c}："), F.col(c).cast("string")),
        )
        for c in cols
    ]
    return df.withColumn("row_text", F.concat_ws(sep, *parts))


# ------------------------------------------------------ TSR-lite operator

PDF_TABLE_CELLS_SCHEMA = (
    "doc_no int, table_no int, caption string, rn int, cn int, cell string"
)


def pdf_table_cells(df: DataFrame, id_col: str = "doc_no",
                    blob_col: str = "pdf") -> DataFrame:
    """Distributed TSR-lite over a binary PDF column: one output row per
    recovered table cell (J3 grid inference + J4 caption pairing,
    ragflow_spark.core.tsr_lite; reference semantics from
    deepdoc/vision/table_structure_recognizer.py:133-345 and
    deepdoc/parser/pdf_parser.py:691-738). Arrow-batched mapInPandas — the
    per-document work is sequential, the document axis is distributed."""

    def run(batches):
        import pandas as pd

        from ragflow_spark.core.tsr_lite import pdf_tables_cells

        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in
                ("doc_no", "table_no", "caption", "rn", "cn", "cell")
            }
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col) or b"")
                for tno, (cap, grid) in enumerate(pdf_tables_cells(blob)):
                    for rn, row in enumerate(grid):
                        for cn, cell in enumerate(row):
                            if not cell:
                                continue
                            out["doc_no"].append(getattr(r, id_col))
                            out["table_no"].append(tno + 1)
                            out["caption"].append(cap)
                            out["rn"].append(rn)
                            out["cn"].append(cn)
                            out["cell"].append(cell)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        run, schema=PDF_TABLE_CELLS_SCHEMA
    )


def table_row_chunks(df: DataFrame, id_col: str = "doc_no",
                     blob_col: str = "blob", fmt: str = "csv") -> DataFrame:
    """Distributed `table` template (rag/app/table.py:123-240) over a
    binary spreadsheet/CSV column: one output row per kept data row, with
    the per-column type-voted value transforms of
    core/table_template.table_rows. Arrow-batched mapInPandas — per-doc
    work sequential, document axis distributed."""

    def run(batches):
        import pandas as pd

        from ragflow_spark.core.table_template import table_rows

        for pdf in batches:
            out: dict[str, list] = {"doc_no": [], "row_idx": [],
                                    "row_text": []}
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col) or b"")
                for i, line in enumerate(table_rows(blob, fmt)):
                    out["doc_no"].append(getattr(r, id_col))
                    out["row_idx"].append(i)
                    out["row_text"].append(line)
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        run, schema="doc_no int, row_idx int, row_text string"
    )
