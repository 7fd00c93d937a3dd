"""Unit-normalization operators: height→cm and weight→kg (BMI-inferred units).

Re-expresses the reference's per-row Python (height_to_cm at
/root/reference/etl.py:146-183, weight_to_kg at etl.py:220-284,
normalize_weights at etl.py:287-308) as pure Catalyst ``when``-chains over
``regexp_extract`` — fully whole-stage-codegen-able, no Python in the hot
path. Branch order is preserved exactly (SURVEY §2.5 F1/F2): the cm check
precedes ft/in; the plausibility pass can override explicit units.

Verified goldens (SURVEY §5.3): "68 in"→172.72, "5ft 6in"→167.64,
"1.75"→175.0, "162"→162.0; ("300 kg", 220cm)→(300.0, implausible_bmi_62.0);
("54.5", 162cm)→(54.5, missing_unit_assumed_kg);
("150", 180cm)→(68.0388, missing_unit_assumed_lb).

Deviation from reference: strings whose first numeric token is not a valid
float (e.g. "..") crash the reference with ValueError/IndexError; the engine
yields NULL (height) / reason "no_numeric_found" (weight).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.quality import log_frame

LB_TO_KG = 0.453592
FIRST_NUM = r"([\d.]+)"


def height_to_cm(col: Column) -> Column:
    """F1: mixed-format height string → centimeters (double)."""
    s = F.lower(F.trim(col.cast("string")))
    first_num = F.nullif(F.regexp_extract(s, FIRST_NUM, 1), F.lit("")).cast("double")
    # meters, e.g. "1.8m" — standalone m (word-boundary), and not a cm string
    is_m = s.rlike(r"\b\d+(\.\d+)?\s*m\b") & ~s.contains("cm")
    is_cm = s.contains("cm")
    # feet/inches, anchored at start like the reference's re.match: 5ft 6in, 5'6", 5'6
    ft = F.nullif(F.regexp_extract(s, r"^(\d+)\s*(?:ft|')", 1), F.lit("")).cast("double")
    inches = F.nullif(
        F.regexp_extract(s, r"^(?:\d+)\s*(?:ft|')\s*(\d+)", 1), F.lit("")
    ).cast("double")
    is_in = s.contains("in")
    is_bare = s.rlike(r"^[\d.]+$")
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(is_m, first_num * 100.0)
        .when(is_cm, first_num)
        .when(ft.isNotNull(), ft * 30.48 + F.coalesce(inches, F.lit(0.0)) * 2.54)
        .when(is_in, first_num * 2.54)
        .when(is_bare & (first_num < 3.0), first_num * 100.0)
        .when(is_bare, first_num)
        .otherwise(F.lit(None).cast("double"))
    )


def weight_to_kg_struct(weight_col: Column, height_cm_col: Column) -> Column:
    """F2: mixed-format weight → struct(weight_kg, flagged, reason).

    Implements all nine reason branches of the reference (etl.py:220-284):
    missing_value, missing_marker, no_numeric_found, (ok for explicit
    kg/lb), missing_unit_assumed_kg, missing_unit_assumed_lb,
    ambiguous_missing_unit, no_height_missing_unit, then the final
    plausibility pass (implausible_bmi_fixed / implausible_bmi_{x:.1f})
    which applies even to explicit units.
    """
    s = F.lower(F.trim(weight_col.cast("string")))
    is_missing = weight_col.isNull()
    is_marker = s.isin("", "na", "n/a", "none", "null", "-")
    num_str = F.nullif(F.regexp_extract(s, FIRST_NUM, 1), F.lit(""))
    val = num_str.cast("double")
    no_num = num_str.isNull() | val.isNull()

    has_kg = s.contains("kg")
    has_lb = s.contains("lb")
    h_m2 = F.pow(height_cm_col / 100.0, F.lit(2.0))  # height in meters, squared
    bmi_kg = val / h_m2
    bmi_lb = (val * LB_TO_KG) / h_m2
    heuristic = F.when(val > 140.0, val * LB_TO_KG).otherwise(val)

    # --- base pass: explicit units, else BMI-plausibility inference ---
    base_w = (
        F.when(has_kg, val)
        .when(has_lb, val * LB_TO_KG)
        .when(
            height_cm_col.isNotNull(),
            F.when(bmi_kg.between(10.0, 45.0), val)
            .when(bmi_lb.between(10.0, 45.0), val * LB_TO_KG)
            .otherwise(heuristic),
        )
        .otherwise(heuristic)
    )
    base_reason = (
        F.when(has_kg | has_lb, F.lit("ok"))
        .when(
            height_cm_col.isNotNull(),
            F.when(bmi_kg.between(10.0, 45.0), F.lit("missing_unit_assumed_kg"))
            .when(bmi_lb.between(10.0, 45.0), F.lit("missing_unit_assumed_lb"))
            .otherwise(F.lit("ambiguous_missing_unit")),
        )
        .otherwise(F.lit("no_height_missing_unit"))
    )
    base_flagged = ~(has_kg | has_lb)

    # --- plausibility pass (etl.py:269-283): may override explicit units ---
    bmi = base_w / h_m2
    implausible = height_cm_col.isNotNull() & ((bmi < 10.0) | (bmi > 60.0))
    flipped = F.when(has_kg, base_w / LB_TO_KG).otherwise(base_w * LB_TO_KG)
    new_bmi = flipped / h_m2
    fix_ok = new_bmi.between(10.0, 45.0)

    final_w = F.when(implausible & fix_ok, flipped).otherwise(base_w)
    final_reason = F.when(implausible & fix_ok, F.lit("implausible_bmi_fixed")).when(
        implausible, F.format_string("implausible_bmi_%.1f", bmi)
    ).otherwise(base_reason)
    final_flagged = F.when(implausible, F.lit(True)).otherwise(base_flagged)

    guard_reason = (
        F.when(is_missing, F.lit("missing_value"))
        .when(is_marker, F.lit("missing_marker"))
        .when(no_num, F.lit("no_numeric_found"))
    )
    w = F.when(guard_reason.isNotNull(), F.lit(None).cast("double")).otherwise(final_w)
    reason = F.coalesce(guard_reason, final_reason)
    flagged = F.when(guard_reason.isNotNull(), F.lit(True)).otherwise(final_flagged)

    return F.struct(
        w.alias("weight_kg"), flagged.alias("flagged"), reason.alias("reason")
    )


def normalize_heights(df: DataFrame, column: str = "height") -> DataFrame:
    """Derive ``height_cm``. The reference never logs height issues
    (acknowledged TODO at etl.py:666) — parity kept; see normalize_weights
    for the logged pattern."""
    return df.withColumn("height_cm", height_to_cm(F.col(column)))


def normalize_weights(
    df: DataFrame,
    column: str = "weight",
    height_col: str = "height_cm",
    filename: str = "patients.csv",
) -> tuple[DataFrame, DataFrame]:
    """Derive ``weight_kg`` + the flagged-row log stream (etl.py:287-308)."""
    with_struct = df.withColumn(
        "_w", weight_to_kg_struct(F.col(column), F.col(height_col))
    )
    clean = with_struct.withColumn("weight_kg", F.col("_w.weight_kg")).drop("_w")
    logs = log_frame(
        with_struct.filter(F.col("_w.flagged")),
        patient_id=F.col("patient_id"),
        filename=F.lit(filename),
        original_value=F.col(column),
        cleaned_value=F.col("_w.weight_kg"),
        column_name=F.lit(column),
        reason=F.col("_w.reason"),
    )
    return clean, logs
