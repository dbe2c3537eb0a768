"""Semi-structured (JSON string) column handling.

Event logs at scale almost always carry a free-form JSON properties column
(the testdata's ``events.props`` is one). The scalable pattern is:

1. infer or declare a schema ONCE (from a bounded sample),
2. parse with ``from_json`` into a typed struct — a native, codegen'd
   expression the optimizer can prune through (only the accessed struct
   fields are actually decoded under ``spark.sql.json`` pruning), never a
   per-row Python ``json.loads``.

``get_json_object`` is deliberately not wrapped: for more than one field it
re-parses the document per call, while one ``from_json`` parses once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def infer_json_schema(
    spark: SparkSession, df: DataFrame, col: str, sample_rows: int = 1000
):
    """Infer a StructType for a JSON string column from a bounded sample.

    The sample (``sample_rows`` non-null documents) goes through Spark's own
    JSON schema inference; only the sampled strings leave the plan. Run once
    per pipeline deployment and persist/declare the result — inference per
    job would re-scan and can drift day to day.
    """
    from pyspark.sql.types import StructType

    sample = [
        r[0]
        for r in df.select(col).where(F.col(col).isNotNull()).limit(sample_rows).collect()
    ]
    if not sample:
        raise ValueError(f"no non-null documents in '{col}' to infer from")
    inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    # malformed sampled docs make Spark's inference emit a _corrupt_record
    # field — strip it: it is an inference artifact, not a data field, and
    # leaving it in would collide with parse_json(drop_corrupt=True)'s own
    # corrupt-record column (AMBIGUOUS_REFERENCE_TO_FIELDS)
    return StructType([f for f in inferred.fields if f.name != "_corrupt_record"])


def parse_json(
    df: DataFrame,
    col: str,
    schema,
    out_col: str | None = None,
    drop_corrupt: bool = False,
) -> DataFrame:
    """Parse a JSON string column into a typed struct column ``out_col``
    (default: replace ``col``).

    Malformed documents parse to a struct of ALL-NULL fields (Spark's
    PERMISSIVE ``from_json`` does NOT null the struct itself), which is
    indistinguishable from a valid ``{}``; ``drop_corrupt=True`` therefore
    parses with an explicit corrupt-record field and filters rows where it
    fired (null inputs are kept — absent, not malformed).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    out = out_col or col
    crpt = "_corrupt_record"
    if any(f.name == crpt for f in schema.fields):
        raise ValueError(
            f"schema must not contain '{crpt}' (reserved for corrupt-record "
            "detection; infer_json_schema strips it automatically)"
        )
    if not drop_corrupt:
        return df.withColumn(out, F.from_json(F.col(col), schema))
    with_crpt = StructType(list(schema.fields) + [StructField(crpt, StringType())])
    parsed = df.withColumn(
        out,
        F.from_json(F.col(col), with_crpt, {"columnNameOfCorruptRecord": crpt}),
    )
    parsed = parsed.filter(
        F.col(col).isNull() | F.col(out).getField(crpt).isNull()
    )
    return parsed.withColumn(out, F.col(out).dropFields(crpt))


def json_get(col: str | Column, *path: str) -> Column:
    """Single-field extraction for ad-hoc exploration:
    ``json_get("props", "k")`` ≡ ``get_json_object(props, '$.k')`` (string
    result). For multiple fields or typed access, use ``parse_json``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, "$." + ".".join(path))
