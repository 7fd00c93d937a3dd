"""Spatial operators: grid-bucketed radius joins over point sets.

A radius join ("all pairs within r km") can never be a cross join at
scale. The standard shape is GRID BUCKETING: snap every point to a cell
of side ≥ r, replicate one side into its 3×3 cell neighborhood (a bounded
×9 explode — cheap, and only on the smaller side), equi-join on the cell
id, and run the exact haversine only inside neighborhoods. Candidate
count is O(points × local density), the spatial analog of LSH banding in
ext/dedup.py; the join shuffles on well-distributed cell ids.

Cell side is expressed in degrees; one degree of latitude ≈ 111.32 km,
so ``cell_deg`` must be ≥ radius_km / 111.32 / cos(max |lat|) for the
3×3 neighborhood to be exhaustive (asserted by the caller choosing the
grid; longitude degrees shrink with latitude). Antimeridian wrap-around
is out of scope and documented — shift coordinates before joining polar
or dateline data.

Determinism: haversine is ONE double expression (no accumulation);
results are rounded before comparison/aggregation per the repo float
policy, so a SQL engine replays the join exactly.

Reference parity note: the reference repo has no spatial surface; this
extends the training-data curation layer (e.g. geo-dedup of scraped
points of interest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — one closed-form double expression."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Stable cell id 'gy:gx' for a square lat/lon grid."""
    gy = F.floor(lat / F.lit(cell_deg)).cast("long")
    gx = F.floor(lon / F.lit(cell_deg)).cast("long")
    return F.concat_ws(":", gy, gx)


def _neighbor_cells(lat: Column, lon: Column, cell_deg: float) -> Column:
    gy = F.floor(lat / F.lit(cell_deg)).cast("long")
    gx = F.floor(lon / F.lit(cell_deg)).cast("long")
    return F.array(
        *[
            F.concat_ws(":", gy + dy, gx + dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    radius_km: float,
    cell_deg: float,
    left_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    round_to: int = 6,
    extra_pair_filter: Column | None = None,
) -> DataFrame:
    """(left_id, right_id, dist_km): all cross-side pairs within
    ``radius_km``. The left side explodes into its 3×3 neighborhood, the
    right side keys by its own cell, the join is a plain equi-join on
    the cell id, a latitude bounding box prunes candidates cheaply, and
    haversine decides inside the band. Requires ``cell_deg`` ≥
    radius_km/111.32/cos(max|lat|). ``extra_pair_filter`` (over
    left_id/right_id) is applied before any distance math — the self-join
    uses it to halve the candidate set."""
    import math

    lid, llat, llon = left_cols
    rid, rlat, rlon = right_cols
    l = left.select(
        F.col(lid).alias("left_id"),
        F.col(llat).alias("_llat"),
        F.col(llon).alias("_llon"),
        F.explode(
            _neighbor_cells(F.col(llat), F.col(llon), cell_deg)
        ).alias("_cell"),
    )
    r = right.select(
        F.col(rid).alias("right_id"),
        F.col(rlat).alias("_rlat"),
        F.col(rlon).alias("_rlon"),
        grid_cell(F.col(rlat), F.col(rlon), cell_deg).alias("_cell"),
    )
    # exact-necessary latitude bound (meridian km/degree on the sphere):
    # |dlat| > degrees(r/R) ⇒ great-circle distance > r, so this cheap
    # comparison prunes most candidates before any trig runs
    lat_bound = math.degrees(radius_km / EARTH_RADIUS_KM)
    dist = F.round(
        haversine_km(
            F.col("_llat"), F.col("_llon"), F.col("_rlat"), F.col("_rlon")
        ),
        round_to,
    )
    joined = l.join(r, on="_cell")
    if extra_pair_filter is not None:
        joined = joined.filter(extra_pair_filter)
    return (
        joined.filter(
            F.abs(F.col("_rlat") - F.col("_llat")) <= F.lit(lat_bound)
        )
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select("left_id", "right_id", "dist_km")
    )


def self_radius_pairs(
    points: DataFrame,
    *,
    radius_km: float,
    cell_deg: float,
    cols: tuple[str, str, str] = ("id", "lat", "lon"),
    round_to: int = 6,
) -> DataFrame:
    """Unordered within-set pairs (id_a < id_b) within ``radius_km`` —
    the geo-dedup shape; the id inequality removes mirror and self
    matches after the grid join."""
    got = radius_join(
        points,
        points,
        radius_km=radius_km,
        cell_deg=cell_deg,
        left_cols=cols,
        right_cols=cols,
        round_to=round_to,
        extra_pair_filter=F.col("left_id") < F.col("right_id"),
    )
    return got.select(
        F.col("left_id").alias("id_a"),
        F.col("right_id").alias("id_b"),
        "dist_km",
    )
