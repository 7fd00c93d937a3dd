"""Code-mapping and enum-validation operators.

F4: sex → ISO/IEC 5218 (reference map_sex_to_iso5218_with_log,
/root/reference/etl.py:312-367). P5: enum validation with "UNKNOWN" fill
(etl.py:577-588). F10: boolean coercion (etl.py:108-111).
All pure ``when``-chains; log keysets differ per branch exactly like the
reference (mapped_code for missing/invalid, cleaned_value for U → SURVEY §1.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.quality import log_frame

ISO5218 = {"M": 1, "F": 2, "U": 0, "O": 9}


def sex_to_iso5218(col: Column) -> Column:
    """F4 value mapping: M→1 F→2 O→9 U→0, missing/unmapped→0."""
    s = F.upper(F.trim(col.cast("string")))
    return (
        F.when(col.isNull(), F.lit(0))
        .when(s == "M", F.lit(1))
        .when(s == "F", F.lit(2))
        .when(s == "O", F.lit(9))
        .otherwise(F.lit(0))  # U and any invalid token
        .cast("int")
    )


def sex_log_reason(col: Column) -> Column:
    """Reason for rows the reference logs (all rows that map to 0)."""
    s = F.upper(F.trim(col.cast("string")))
    return (
        F.when(col.isNull(), F.lit("missing_value"))
        .when(~s.isin(*ISO5218), F.lit("invalid_code"))
        .when(s == "U", F.lit("unknown_or_missing"))
    )


def map_sex(
    df: DataFrame, column: str = "sex", filename: str = "patients.csv"
) -> tuple[DataFrame, DataFrame]:
    clean = df.withColumn("sex_iso", sex_to_iso5218(F.col(column)))
    reason = sex_log_reason(F.col(column))
    flagged = df.filter(reason.isNotNull()).withColumn("_reason", reason)
    logs = log_frame(
        flagged,
        patient_id=F.col("patient_id"),
        filename=F.lit(filename),
        original_value=F.col(column),
        # reference quirk kept: missing/invalid branches write mapped_code,
        # the U branch writes cleaned_value (etl.py:333-363)
        mapped_code=F.when(
            F.col("_reason").isin("missing_value", "invalid_code"), F.lit("0")
        ),
        cleaned_value=F.when(F.col("_reason") == "unknown_or_missing", F.lit("0")),
        reason=F.col("_reason"),
    )
    return clean, logs


def validate_enum(
    df: DataFrame,
    column: str,
    valid: list[str],
    fill: str = "UNKNOWN",
    filename_col: str = "source_file",
    id_col: str = "patient_id",
) -> tuple[DataFrame, DataFrame]:
    """P5: rows whose ``column`` is outside ``valid`` are logged then filled.

    Reference: etl.py:577-588 (valid after lowercasing; fill is upper-case
    "UNKNOWN", lowercased later by the final normalize pass — order kept).
    NULL column values are 'not in' the valid set in pandas, so they are
    filled + logged too; Spark ~isin(NULL) is NULL, hence the explicit guard.
    """
    col = F.col(column)
    invalid = col.isNull() | ~col.isin(*valid)
    logs = log_frame(
        df.filter(invalid),
        patient_id=F.col(id_col),
        filename=F.col(filename_col),
        column_name=F.lit(column),
        original_value=col,
        reason=F.lit("invalid_" + column),
    )
    clean = df.withColumn(column, F.when(invalid, F.lit(fill)).otherwise(col))
    return clean, logs


def coerce_bool(col: Column) -> Column:
    """F10: lowercase-"true" → True, other non-null text → False, NULL → NULL."""
    return F.when(col.isNotNull(), F.lower(col.cast("string")) == "true")
