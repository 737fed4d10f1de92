"""Geo-distance and bounding-box queries — the READ-side twin of
``GeoShardingStrategy`` (the reference declares geo sharding,
``GeoShardingStrategy.java:26-44``; ``operators/sharding.py``
implements the write/prune side as a region partition filter). This
module answers the queries such a layout exists for: "rows within
``radius_km`` of a point" (Elasticsearch ``geo_distance``) and "rows
inside a lat/lon rectangle" (``geo_bounding_box``).

Plan shape, designed so 100 TB never pays a full-corpus trig scan:

1. ``geo_distance`` filters with a BOUNDING-BOX pre-filter first —
   pure ``BETWEEN`` comparisons on the raw lat/lon columns, which
   Catalyst pushes into the parquet scan (min/max row-group skip)
   — then applies the exact haversine predicate only to box
   survivors. The box is the circle's circumscribing rectangle
   (driver-side spherical math), so the two-step filter is exactly
   equivalent to haversine-only.
2. ``write_geo_partitioned`` lays the table out by a coarse
   lat/lon grid cell (a flat geohash: ``cell_deg``-degree squares,
   one int partition column). ``read_geo_pruned`` turns a query
   circle into the literal cell set its bounding box intersects —
   a partition IN-filter, so file listing skips every other cell
   directory (``PruneFileSourcePartitions``), the same mechanism as
   modulo/region sharding.

Haversine (great-circle) distance uses the numerically-stable
asin(sqrt(a)) form on a spherical earth (R = 6371.0088 km, the IUGG
mean radius); the expression is written so an ANSI-SQL engine
replaying the same operation order reproduces it bit-for-bit.

Antimeridian: a query circle whose bounding box crosses the +-180
meridian widens its longitude band to the full range (correct,
conservative — the haversine predicate still filters exactly);
poles clamp the latitude band.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088

GEO_CELL_COL = "__geo_cell"


def _check_point(lat: float, lon: float) -> None:
    if not -90.0 <= lat <= 90.0:
        raise ValueError(f"latitude must be in [-90, 90], got {lat}")
    if not -180.0 <= lon <= 180.0:
        raise ValueError(f"longitude must be in [-180, 180], got {lon}")


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two (degree) points as a
    pure codegen expression — columns or literals on either side. The
    asin(sqrt(a)) form with a clamp: fp roundoff can nudge ``a`` a
    hair above 1 for antipodal points, where sqrt > 1 would NaN the
    asin. The clamp is a CASE, not ``least`` — Spark's ``least``
    IGNORES NULLs, which would turn a NULL coordinate into asin(1)
    (half the circumference) instead of NULL; the CASE propagates
    NULL through its else branch, and the oracle replays the same
    CASE."""
    lat1, lon1 = _c(lat1), _c(lon1)
    lat2, lon2 = _c(lat2), _c(lon2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    sdlat = F.sin(dlat / F.lit(2.0))
    sdlon = F.sin(dlon / F.lit(2.0))
    a = sdlat * sdlat + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * (
        sdlon * sdlon
    )
    root = F.sqrt(a)
    clamped = F.when(root > F.lit(1.0), F.lit(1.0)).otherwise(root)
    return F.lit(2.0) * F.lit(EARTH_RADIUS_KM) * F.asin(clamped)


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(float(v))


def bounding_box(
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """``geo_bounding_box`` predicate: plain BETWEEN comparisons, so
    Catalyst pushes them into the scan (PushedFilters + row-group
    min/max skip). NULL coordinates never match. Raises on an empty
    or out-of-range box; a box crossing the antimeridian must be
    split by the caller (two boxes OR-ed) — rejected here."""
    if min_lat > max_lat:
        raise ValueError(f"empty lat band [{min_lat}, {max_lat}]")
    if min_lon > max_lon:
        raise ValueError(
            f"min_lon {min_lon} > max_lon {max_lon}: split an "
            "antimeridian-crossing box into two"
        )
    _check_point(min_lat, min_lon)
    _check_point(max_lat, max_lon)
    return (
        F.col(lat_col).between(F.lit(min_lat), F.lit(max_lat))
        & F.col(lon_col).between(F.lit(min_lon), F.lit(max_lon))
    )


def box_for_radius(
    center_lat: float, center_lon: float, radius_km: float
) -> tuple[float, float, float, float]:
    """The circumscribing lat/lon rectangle of a query circle
    (driver-side spherical math): latitude band center +- the radius
    arc; longitude band widened by 1/cos(lat at the band edge) so the
    box contains the circle at every latitude inside the band. Bands
    clamp at the poles / widen to the full range across the
    antimeridian (conservative — the haversine refine is exact).
    Returns (min_lat, max_lat, min_lon, max_lon)."""
    _check_point(center_lat, center_lon)
    if radius_km <= 0:
        raise ValueError(f"radius_km must be > 0, got {radius_km}")
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    min_lat = max(-90.0, center_lat - dlat)
    max_lat = min(90.0, center_lat + dlat)
    # widest longitude spread occurs at the band latitude CLOSEST to a
    # pole; if the band touches a pole every longitude is in range
    edge = max(abs(min_lat), abs(max_lat))
    if edge >= 90.0 - 1e-9:
        return (min_lat, max_lat, -180.0, 180.0)
    dlon = math.degrees(
        radius_km / (EARTH_RADIUS_KM * math.cos(math.radians(edge)))
    )
    if dlon >= 180.0:
        return (min_lat, max_lat, -180.0, 180.0)
    min_lon = center_lon - dlon
    max_lon = center_lon + dlon
    if min_lon < -180.0 or max_lon > 180.0:
        # crosses the antimeridian: conservative full-range lon band
        return (min_lat, max_lat, -180.0, 180.0)
    return (min_lat, max_lat, min_lon, max_lon)


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_km: float,
    dist_col: str = "dist_km",
) -> DataFrame:
    """Elasticsearch ``geo_distance`` query: rows within ``radius_km``
    of the center, plus the distance itself (6dp, km) as ``dist_col``.
    Two-stage filter — pushdown-able bounding box, then the exact
    haversine predicate — equivalent to haversine-only but the trig
    runs on box survivors, and the box comparisons reach the parquet
    scan as PushedFilters."""
    if dist_col in df.columns:
        raise ValueError(
            f"geo_distance: input already has a {dist_col!r} column"
        )
    mn_lat, mx_lat, mn_lon, mx_lon = box_for_radius(
        center_lat, center_lon, radius_km
    )
    d = haversine_km(F.col(lat_col), F.col(lon_col), center_lat, center_lon)
    return (
        df.filter(
            bounding_box(lat_col, lon_col, mn_lat, mx_lat, mn_lon, mx_lon)
        )
        .withColumn(dist_col, F.round(d, 6))
        .filter(F.col(dist_col) <= F.lit(float(radius_km)))
    )


def geo_cell(lat_col, lon_col, cell_deg: float = 15.0) -> Column:
    """Flat grid-cell id for a (lat, lon) point: row-major index of
    the ``cell_deg``-degree square containing it — the geo layout's
    partition value. Edge points (lat 90, lon 180) fold into the last
    cell so the id range is dense."""
    lat = lat_col if isinstance(lat_col, Column) else F.col(lat_col)
    lon = lon_col if isinstance(lon_col, Column) else F.col(lon_col)
    n_lon = int(math.ceil(360.0 / cell_deg))
    lat_i = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)),
        F.lit(int(math.ceil(180.0 / cell_deg)) - 1),
    )
    lon_i = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)),
        F.lit(n_lon - 1),
    )
    return (lat_i * F.lit(n_lon) + lon_i).cast("int")


def cells_for_box(
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    cell_deg: float = 15.0,
) -> list[int]:
    """The grid cells a lat/lon rectangle intersects — driver-side
    math, the literal IN-set a pruned geo read filters on. Bounded:
    at most (180/cell_deg) x (360/cell_deg) ids."""
    n_lon = int(math.ceil(360.0 / cell_deg))
    n_lat = int(math.ceil(180.0 / cell_deg))
    lat_lo = min(int((min_lat + 90.0) // cell_deg), n_lat - 1)
    lat_hi = min(int((max_lat + 90.0) // cell_deg), n_lat - 1)
    lon_lo = min(int((min_lon + 180.0) // cell_deg), n_lon - 1)
    lon_hi = min(int((max_lon + 180.0) // cell_deg), n_lon - 1)
    return [
        li * n_lon + lo
        for li in range(lat_lo, lat_hi + 1)
        for lo in range(lon_lo, lon_hi + 1)
    ]


def geo_grid_counts(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 15.0,
    min_count: int = 1,
) -> DataFrame:
    """Geo-grid bucket aggregation (the Elasticsearch ``geohash_grid``
    / ``geotile_grid`` agg on the flat ``geo_cell`` grid, NEW r15):
    doc counts per grid cell plus the cell's center point — the
    density-map readout behind every "where are my users" heatmap.
    Rows with a NULL coordinate carry no bucket (ES ignores missing
    geo points); cells under ``min_count`` drop (ES's min_doc_count).
    Output (cell, center_lat, center_lon, cnt) ordered (cnt desc,
    cell asc) — ES's count-descending bucket order.

    One partial-aggregatable groupBy over the codegen cell id; output
    is grid-bounded (<= (180/cell)*(360/cell) rows), never
    corpus-sized."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    n_lon = int(math.ceil(360.0 / cell_deg))
    per = (
        df.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .groupBy(geo_cell(lat_col, lon_col, cell_deg).alias("cell"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= F.lit(min_count))
    )
    lat_i = F.floor(F.col("cell") / F.lit(n_lon))
    lon_i = F.col("cell") % F.lit(n_lon)
    return per.select(
        "cell",
        F.round(
            lat_i * F.lit(cell_deg) - F.lit(90.0) + F.lit(cell_deg / 2.0), 6
        ).alias("center_lat"),
        F.round(
            lon_i * F.lit(cell_deg) - F.lit(180.0) + F.lit(cell_deg / 2.0), 6
        ).alias("center_lon"),
        "cnt",
    ).orderBy(F.col("cnt").desc(), F.col("cell").asc())


def write_geo_partitioned(
    df: DataFrame,
    path: str,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 15.0,
) -> None:
    """Writer side of the geo layout: materialize the grid cell and
    partition by it — one directory per cell, so a radius/box read
    lists only the intersecting cells' files. Rows with NULL
    coordinates land in the NULL partition (readable, never matched
    by a geo predicate)."""
    (
        df.withColumn(GEO_CELL_COL, geo_cell(lat_col, lon_col, cell_deg))
        .write.mode("overwrite")
        .partitionBy(GEO_CELL_COL)
        .parquet(path)
    )


def read_geo_pruned(
    spark: SparkSession,
    path: str,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_km: float,
    cell_deg: float = 15.0,
    dist_col: str = "dist_km",
) -> DataFrame:
    """geo_distance over a ``write_geo_partitioned`` layout: the query
    circle's bounding box becomes a literal cell IN-filter (partition
    prune — untouched cell directories are never listed or read),
    then the box + haversine refine as in ``geo_distance``."""
    mn_lat, mx_lat, mn_lon, mx_lon = box_for_radius(
        center_lat, center_lon, radius_km
    )
    cells = cells_for_box(mn_lat, mx_lat, mn_lon, mx_lon, cell_deg)
    df = spark.read.parquet(path).filter(F.col(GEO_CELL_COL).isin(cells))
    return geo_distance(
        df, lat_col, lon_col, center_lat, center_lon, radius_km, dist_col
    ).drop(GEO_CELL_COL)
