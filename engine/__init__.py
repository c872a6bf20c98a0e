"""PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the query/data-processing capabilities of
michaelsteffen/osm-history-analysis (reference at /root/reference, Scala/Spark 2.2),
re-grounded over image+caption tables with cell indexing (grid/hex/S2), point-in-polygon
joins, kNN via cell-ring expansion, raster-tile <-> vector-cell assignment, and the
reference's change-computation + geometry-propagation pipeline — all expressed as
DataFrame/Column plans (Catalyst-optimizable) with vectorized pandas/Arrow UDFs only
where procedural logic is unavoidable.

Modules:
    session      SparkSession builders (bench/test configs)
    schema       explicit StructTypes for every table (never inferred)
    cells        cell-index kernel: grid (Column-only), hex + S2 (numpy pandas_udf)
    synth        deterministic synthetic tables (seed=42): images, polygons, tiles,
                 object_versions
    image_codec  raw-RGB24 / zlib-PNG codec + PSNR (numpy, Arrow batches)
    diff         first-order change generator (lag windows, change taxonomy 0-9)
    temporal     ref-change events + temporal parent tree (union + window merge)
    propagate    bounded change-propagation loop + cell-hierarchy rollup
    coalesce     change coalescing (group-agg with bbox union)
    joins        PIP join, kNN join, as-of join, tile assignment
    textops      dedup (exact/minhash/simhash/jaccard), langid, quality, tokens
    embedops     cosine top-k ANN (brute force + LSH-bucketed)
    skew         hot-key detection + salting
    iceberg_lite snapshot/manifest table layer (JSON manifests over parquet)
"""

__version__ = "0.1.0"
