"""Geospatial operators: grid-bucketed radius join and cell
aggregation — the spatial-join family (points-within-distance,
density maps) expressed in the engine's standard bucketed-join shape.

The fixture tables carry no coordinates, so the registry keys run over
DETERMINISTICALLY FABRICATED lat/lon (customer keys hashed onto a
10 x 20 degree region — dense enough that a 50 km radius yields a
non-trivial pair set) — an honest cross-engine parity harness;
``api.within_radius`` / ``api.geo_cell_counts`` are the user surface
for real coordinate tables.

Scale shape — the same candidate-pruning pattern as MinHash bands and
IVF cells: each point gets an integer grid cell (floor of degrees);
the LEFT side replicates into its 3 x 3 cell neighborhood (a bounded
x9 map-side explode) and the join runs keyed on the cell — candidate
pairs are neighbors-of-cell, never all pairs, so the pair stream is
linear in true neighbors at any corpus size. The exact haversine then
filters candidates. At 100 TB the cell id is the table's partition
key and a radius query touches 9 partitions.

Float determinism: both engines evaluate the identical haversine
expression on identical doubles (the fabricated coordinates are
integer/100.0); sin/cos/asin agree to ~1 ulp across libm and the JVM,
so a rounded-to-3-decimals distance only flips if a pair sits within
~1e-10 km of a rounding boundary — structurally impossible for the
hashed fixture and negligible for real data. The cell partitioner
itself is exact integer math.

Correctness constraint (documented, also the reason the fabricated
region stays within |lat| < 66 deg): the 3 x 3 neighborhood covers the
radius only while ``radius_km <= cell_deg * 111 * cos(max |lat|)``;
at higher latitudes or larger radii pass a larger ``cell_deg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_EARTH_KM = 6371.0


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * _EARTH_KM) * F.asin(F.sqrt(a))


def _fabricated_points(cust: DataFrame) -> DataFrame:
    """Customer keys hashed onto lat [0, 10), lon [0, 20) at 0.01-deg
    resolution — ~1100 x 2200 km, dense enough for real 50 km
    neighborhoods. Integer/100.0 doubles: identical in both engines."""
    return cust.select(
        F.col("c_custkey").alias("point_id"),
        ((F.col("c_custkey") * 7919 % 1000) / 100.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 2000) / 100.0).alias("lon"),
    )


def within_radius(
    points: DataFrame,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_km: float = 50.0,
    cell_deg: float = 1.0,
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (haversine),
    found via the grid-bucketed neighborhood join described in the
    module docstring. Returns (id1, id2, dist_km) with id1 < id2 and
    dist_km rounded to 3 decimals.

    Coverage: the latitude ring is +-1 cell (validated: ``radius_km <=
    cell_deg * 111``); the LONGITUDE fan-out is computed PER POINT
    from its latitude — ``ceil(radius / (111 * cell_deg * cos(lat)))``
    cells, capped at the full circle — because a fixed +-1 ring
    silently misses pairs wherever a longitude cell is narrower than
    the radius (111 km * cos(lat) shrinks toward the poles). The
    data-dependent ``explode(sequence(-k, k))`` keeps the fan-out x3
    in temperate data and widens only for the polar rows that need
    it.

    Known limitation (documented, not silent): candidate cells do NOT
    wrap across the antimeridian — a pair straddling lon +-180 deg is
    not matched. Shift longitudes (e.g. pmod(lon + 360, 360)) before
    calling if your data spans the seam."""
    if cell_deg <= 0 or radius_km <= 0:
        raise ValueError(
            f"cell_deg and radius_km must be positive (got {cell_deg}, {radius_km})"
        )
    if radius_km > cell_deg * 111.0:
        raise ValueError(
            f"radius_km={radius_km} exceeds one latitude cell "
            f"(cell_deg={cell_deg} = {cell_deg * 111.0:.0f} km); increase cell_deg"
        )
    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).cast("double").alias("plat"),
        F.col(lon_col).cast("double").alias("plon"),
        F.floor(F.col(lat_col) / cell_deg).alias("cl"),
        F.floor(F.col(lon_col) / cell_deg).alias("cn"),
    )
    # lon cells per radius at this latitude, capped at the full circle
    half_circle = int(180.0 / cell_deg) + 1
    k = F.least(
        F.lit(half_circle),
        F.ceil(
            F.lit(radius_km)
            / (F.lit(111.0 * cell_deg) * F.cos(F.radians(F.col("plat"))))
        ).cast("int"),
    )
    left = (
        base.withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dj", F.explode(F.sequence(-k, k)))
        .select(
            F.col("pid").alias("id1"),
            F.col("plat").alias("lat1"),
            F.col("plon").alias("lon1"),
            (F.col("cl") + F.col("di")).alias("jcl"),
            (F.col("cn") + F.col("dj")).alias("jcn"),
        )
    )
    right = base.select(
        F.col("pid").alias("id2"),
        F.col("plat").alias("lat2"),
        F.col("plon").alias("lon2"),
        F.col("cl").alias("jcl"),
        F.col("cn").alias("jcn"),
    )
    dist = _haversine_km(
        F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
    )
    return (
        left.join(right, ["jcl", "jcn"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(dist, 3).alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )


def geo_cell_counts(
    points: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Density map: point count per integer grid cell — one keyed agg
    over exact integer cell ids (floor of identical doubles)."""
    return (
        points.groupBy(
            F.floor(F.col(lat_col) / cell_deg).alias("cell_lat"),
            F.floor(F.col(lon_col) / cell_deg).alias("cell_lon"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("cell_lat", "cell_lon")
    )


_FABRICATE_GEO_SQL = """
  SELECT c_custkey AS point_id,
         (c_custkey * 7919 % 1000) / 100.0 AS lat,
         (c_custkey * 104729 % 2000) / 100.0 AS lon
  FROM customer
"""

_RADIUS_SQL = f"""
WITH p AS ({_FABRICATE_GEO_SQL}),
b AS (
  SELECT point_id, lat, lon,
         CAST(floor(lat / 1.0) AS BIGINT) AS cl,
         CAST(floor(lon / 1.0) AS BIGINT) AS cn
  FROM p
),
l AS (
  SELECT point_id AS id1, lat AS lat1, lon AS lon1,
         cl + di.x AS jcl, cn + dj.x AS jcn
  FROM b, (SELECT unnest(range(-1, 2)) AS x) di,
          (SELECT unnest(range(-1, 2)) AS x) dj
),
cand AS (
  SELECT id1, lat1, lon1, point_id AS id2, lat AS lat2, lon AS lon2
  FROM l JOIN b r ON l.jcl = r.cl AND l.jcn = r.cn
  WHERE id1 < point_id
),
scored AS (
  SELECT id1, id2,
         round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
           + cos(radians(lat1)) * cos(radians(lat2))
             * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)
         )), 3) AS dist_km
  FROM cand
)
SELECT id1, id2, dist_km FROM scored
WHERE dist_km <= 40.0
ORDER BY id1, id2
"""


@register("geo_radius_pairs", oracle=_RADIUS_SQL, tags=("ext", "geo"))
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point pairs within 40 km over the fabricated customer
    coordinates (see module docstring) via the grid-bucketed
    neighborhood join."""
    c = tables.load(spark, sf_dir, "customer")
    return within_radius(_fabricated_points(c), radius_km=40.0).orderBy(
        "id1", "id2"
    )


_CELLS_SQL = f"""
WITH p AS ({_FABRICATE_GEO_SQL})
SELECT CAST(floor(lat / 1.0) AS BIGINT) AS cell_lat,
       CAST(floor(lon / 1.0) AS BIGINT) AS cell_lon,
       count(*) AS n_points
FROM p
GROUP BY cell_lat, cell_lon
ORDER BY cell_lat, cell_lon
"""


@register("geo_cell_agg", oracle=_CELLS_SQL, tags=("ext", "geo"))
def geo_cell_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density map of the fabricated customer coordinates: count per
    1-degree grid cell."""
    c = tables.load(spark, sf_dir, "customer")
    return geo_cell_counts(_fabricated_points(c))
