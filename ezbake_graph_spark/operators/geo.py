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
the LEFT side replicates into a +-1 latitude ring crossed with a
PER-LATITUDE adaptive longitude fan-out (x3 in temperate data,
widening only where lon cells narrow toward the poles) and the join
runs keyed on the cell — candidate pairs are neighbors-of-cell, never
all pairs, so the pair stream is linear in true neighbors at any
corpus size. The exact haversine then filters candidates. At 100 TB
the cell id is the table's partition key and a radius query touches
the handful of partitions its fan-out names.

Float determinism: both engines evaluate the identical haversine
expression on identical doubles (the fabricated coordinates are
integer/100.0); sin/cos/asin agree to ~1 ulp across libm and the JVM,
so a rounded-to-3-decimals distance only flips if a pair sits within
~1e-10 km of a rounding boundary — structurally impossible for the
hashed fixture and negligible for real data. The cell partitioner
itself is exact integer math.

Correctness constraint (validated, not silent): the +-1 latitude ring
covers the radius only while ``radius_km <= cell_deg * 111``; larger
radii need a larger ``cell_deg``. The longitude direction needs no
constraint — its fan-out adapts per point, sized with the POLEWARD
edge of the +-1-lat neighborhood (``cos(|lat| + 2*cell_deg)``) so a
match sitting a cell poleward, where lon cells are narrower, still
falls inside the fan (property-tested to |lat| = 80).
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
    wrap_lon: bool = False,
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (haversine),
    found via the grid-bucketed neighborhood join described in the
    module docstring. Returns (id1, id2, dist_km) with id1 < id2 and
    dist_km rounded to 3 decimals.

    Coverage: the latitude ring is +-1 cell (validated: ``radius_km <=
    cell_deg * 111``); the LONGITUDE fan-out is computed PER POINT —
    ``ceil(radius / (111 * cell_deg * cos_edge))`` cells, capped at
    the full circle — because a fixed +-1 ring silently misses pairs
    wherever a longitude cell is narrower than the radius (111 km *
    cos(lat) shrinks toward the poles). ``cos_edge`` uses the POLEWARD
    edge of the +-1-lat join neighborhood, ``|lat| + 2*cell_deg``
    clamped to 90 deg, not the point's own latitude: the matched point
    can sit up to a full cell poleward where lon cells are narrower,
    and sizing the fan at the point's own cos can drop a true
    boundary pair at high |lat| (property-tested to |lat| = 80). The
    data-dependent ``explode(sequence(-k, k))`` keeps the fan-out x3
    in temperate data and widens only for the polar rows that need
    it; within ``2*cell_deg`` of the pole, cos_edge hits 0 and the
    fan covers the full circle — correct, and cheap because such
    rings hold few cells' worth of area.

    Antimeridian: with ``wrap_lon=False`` (default) candidate cells do
    NOT wrap across lon +-180 deg — a pair straddling the seam is not
    matched. Pass ``wrap_lon=True`` (requires ``360/cell_deg``
    integral) to close the seam: cells are computed on lon normalized
    into [0, 360) and the join key wraps modulo the ring size. The
    haversine itself is 360-periodic in dlon, so only the bucketing
    needs wrapping.

    >>> pts = spark.createDataFrame(
    ...     [(1, 0.0, 179.99), (2, 0.0, -179.99)],
    ...     "point_id long, lat double, lon double")
    >>> within_radius(pts, radius_km=50.0).count()  # seam pair missed
    0
    >>> within_radius(pts, radius_km=50.0, wrap_lon=True).collect()
    [Row(id1=1, id2=2, dist_km=2.224)]
    """
    if cell_deg <= 0 or radius_km <= 0:
        raise ValueError(
            f"cell_deg and radius_km must be positive (got {cell_deg}, {radius_km})"
        )
    if radius_km > cell_deg * 111.0:
        raise ValueError(
            f"radius_km={radius_km} exceeds one latitude cell "
            f"(cell_deg={cell_deg} = {cell_deg * 111.0:.0f} km); increase cell_deg"
        )
    ring = 360.0 / cell_deg
    if wrap_lon and abs(ring - round(ring)) > 1e-9:
        raise ValueError(
            f"wrap_lon=True needs 360/cell_deg integral (got {ring}); "
            "pick a cell_deg that tiles the circle"
        )
    lon_cell = (
        F.floor(F.pmod(F.col(lon_col), F.lit(360.0)) / cell_deg)
        if wrap_lon
        else F.floor(F.col(lon_col) / cell_deg)
    )
    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).cast("double").alias("plat"),
        F.col(lon_col).cast("double").alias("plon"),
        F.floor(F.col(lat_col) / cell_deg).alias("cl"),
        lon_cell.alias("cn"),
    )
    # lon cells per radius, capped at the full circle; cos taken at the
    # poleward edge of the +-1-lat neighborhood (ADVICE r6: a match one
    # cell poleward sees narrower lon cells than the probe point does)
    half_circle = int(180.0 / cell_deg) + 1
    cos_edge = F.cos(
        F.radians(F.least(F.lit(90.0), F.abs(F.col("plat")) + F.lit(2.0 * cell_deg)))
    )
    k = F.when(
        cos_edge > F.lit(1e-12),
        F.least(
            F.lit(half_circle),
            F.ceil(F.lit(radius_km) / (F.lit(111.0 * cell_deg) * cos_edge)).cast(
                "int"
            ),
        ),
    ).otherwise(F.lit(half_circle))
    if wrap_lon:
        # wrapped fan: distinct-ify map-side so a full-circle k never
        # emits the same cell (hence the same candidate pair) twice
        n_ring = F.lit(int(round(ring)))
        fan = F.explode(
            F.array_distinct(
                F.transform(F.sequence(-k, k), lambda d: F.pmod(F.col("cn") + d, n_ring))
            )
        )
    else:
        fan = F.explode(F.sequence(F.col("cn") - k, F.col("cn") + k))
    left = (
        base.withColumn("di", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("jcn", fan)
        .select(
            F.col("pid").alias("id1"),
            F.col("plat").alias("lat1"),
            F.col("plon").alias("lon1"),
            (F.col("cl") + F.col("di")).alias("jcl"),
            "jcn",
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


_KNN_K = 3

_KNN_SQL = f"""
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
  WHERE id1 <> point_id
),
scored AS (
  SELECT id1 AS point_id, id2 AS neighbor_id,
         round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat2 - lat1) / 2) * sin(radians(lat2 - lat1) / 2)
           + cos(radians(lat1)) * cos(radians(lat2))
             * sin(radians(lon2 - lon1) / 2) * sin(radians(lon2 - lon1) / 2)
         )), 3) AS dist_km
  FROM cand
),
ranked AS (
  SELECT point_id, neighbor_id, dist_km,
         row_number() OVER (PARTITION BY point_id
                            ORDER BY dist_km, neighbor_id) AS rank
  FROM scored WHERE dist_km <= 40.0
)
SELECT point_id, rank, neighbor_id, dist_km
FROM ranked WHERE rank <= {_KNN_K}
ORDER BY point_id, rank
"""


def knn_within_radius(
    points: DataFrame,
    k: int = _KNN_K,
    radius_km: float = 40.0,
    cell_deg: float = 1.0,
    wrap_lon: bool = False,
) -> DataFrame:
    """k nearest neighbors per point among those within ``radius_km``
    — the bounded-radius kNN join. The radius bound is what makes the
    grid-bucketed candidate set EXACT (a true neighbor outside the
    searched cells would have to be farther than the radius, which
    the ring coverage rules out — see ``within_radius``); unbounded
    kNN over sparse regions would need ring-growing probes instead.
    Ranking is on the rounded (3-decimal) distance with neighbor-id
    tiebreak, so the rank order is engine-independent. Returns
    (point_id, rank, neighbor_id, dist_km); points with no neighbor
    in range emit nothing."""
    from pyspark.sql import Window

    pairs = within_radius(
        points, radius_km=radius_km, cell_deg=cell_deg, wrap_lon=wrap_lon
    )
    sym = pairs.select(
        F.col("id1").alias("point_id"),
        F.col("id2").alias("neighbor_id"),
        "dist_km",
    ).unionByName(
        pairs.select(
            F.col("id2").alias("point_id"),
            F.col("id1").alias("neighbor_id"),
            "dist_km",
        )
    )
    w = Window.partitionBy("point_id").orderBy("dist_km", "neighbor_id")
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("point_id", "rank", "neighbor_id", "dist_km")
        .orderBy("point_id", "rank")
    )


@register("geo_knn_join", oracle=_KNN_SQL, tags=("ext", "geo"))
def geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest neighbors within 40 km per fabricated customer point
    — ``knn_within_radius`` over the same grid-bucketed candidate
    generation as ``geo_radius_pairs`` (one cell-keyed join + one
    per-point window; never all-pairs)."""
    c = tables.load(spark, sf_dir, "customer")
    return knn_within_radius(_fabricated_points(c), k=_KNN_K, radius_km=40.0)
