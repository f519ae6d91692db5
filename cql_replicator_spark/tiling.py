"""Tile assignment — hash-sharding of the primary-key space.

The reference shards every table into N "tiles" with
``abs(xxhash64(concat(pk_cols cast to string))) % totalTiles``
(CQLReplicator.scala K:1832-1843, parquet P:1528, dynamodb D:2401,
PrimaryKeyReconciliation R:400-403), flattening tuple-typed columns to
``(a,b,...)`` strings first.

Deviation (deliberate): we hash the columns *natively* with Spark's
multi-arg ``xxhash64`` instead of concatenating to one string. This
avoids the classic concat ambiguity (("ab","c") vs ("a","bc") collide
under concat-then-hash) and skips materializing a throwaway string per
row — at 100 TB that string concat is real CPU + memory. ``pmod`` rather
than ``abs(...) %`` sidesteps the Long.MIN_VALUE abs() overflow.

Struct/tuple columns are flattened per the reference's rule so tiling is
defined for every type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TILES = 4  # reference default TOTAL_TILES (glue/bin/cqlreplicator:12)


def _flatten(df: DataFrame, c: str) -> Column:
    """Tuple/struct columns hash by their '(f1,f2,...)' rendering (K:1834-1841)."""
    field = df.schema[c]
    if isinstance(field.dataType, T.StructType):
        inner = [F.col(f"{c}.{f.name}").cast("string") for f in field.dataType.fields]
        return F.concat(F.lit("("), F.concat_ws(",", *inner), F.lit(")"))
    if isinstance(field.dataType, T.ArrayType):
        return F.concat(F.lit("["), F.concat_ws(",", F.col(c).cast("array<string>")), F.lit("]"))
    return F.col(c)


def tile_expr(df: DataFrame, pk_cols: list[str], num_tiles: int) -> Column:
    """Column expression assigning each row a tile in [0, num_tiles)."""
    if num_tiles < 1:
        raise ValueError(f"num_tiles must be >= 1, got {num_tiles}")
    return F.pmod(F.xxhash64(*[_flatten(df, c) for c in pk_cols]), F.lit(num_tiles))


def assign_tiles(
    df: DataFrame,
    pk_cols: list[str],
    num_tiles: int = DEFAULT_TILES,
    tile_col: str = "tile",
    repartition: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a tile column; optionally hash-repartition by it.

    The reference repartitions immediately after assignment
    (K:1845-1847). We leave that opt-in: when the next op is a per-tile
    write, `.repartition(n, tile)` co-locates a tile's rows; when the
    next op is a groupBy/join on other keys, the extra shuffle is waste
    and AQE handles layout.
    """
    out = df.withColumn(tile_col, tile_expr(df, pk_cols, num_tiles))
    if repartition:
        out = out.repartition(num_partitions or num_tiles, F.col(tile_col))
    return out


def tile_histogram(df: DataFrame, pk_cols: list[str], num_tiles: int) -> DataFrame:
    """Rows per tile — one groupBy, not a count() per tile like K:2282-2284."""
    return (
        assign_tiles(df, pk_cols, num_tiles)
        .groupBy("tile")
        .count()
        .orderBy("tile")
    )


def resize_tiles(
    snapshots: list[DataFrame],
    pk_cols: list[str],
    new_num_tiles: int,
    tile_col: str = "tile",
) -> DataFrame:
    """Re-shard: union all tile snapshots, distinct, reassign tiles.

    Mirrors the resize flow (K:2082-2223): union -> distinct -> new
    group column -> repartition, with the count-integrity invariant of
    K:2188-2191 (redistributed count == original distinct count) —
    enforced here structurally since we derive from the distinct set.
    """
    if not snapshots:
        raise ValueError("resize_tiles needs at least one snapshot DataFrame")
    unioned = snapshots[0]
    for s in snapshots[1:]:
        unioned = unioned.unionByName(s)
    distinct = unioned.dropDuplicates(pk_cols).drop(tile_col)
    return assign_tiles(distinct, pk_cols, new_num_tiles, tile_col=tile_col,
                        repartition=True, num_partitions=new_num_tiles)


def zvalue_2d(x: str | Column, y: str | Column, bits: int = 10) -> Column:
    """Morton (Z-order) interleaving of two non-negative ints — the
    space-filling-curve clustering key behind multi-dimensional data
    layout (Delta/Iceberg OPTIMIZE ZORDER): sorting or range-
    partitioning 100 TB by z keeps rows close in BOTH dimensions
    close on disk, so min/max file statistics prune scans on either
    predicate column instead of only the leading sort key.

    Pure integer bit arithmetic (2*bits shift/mask terms, whole-stage
    codegen, engine-portable); inputs must already be reduced to
    ``bits`` bits (callers mod/bucket first)."""
    from pyspark.sql import functions as F

    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    z = F.lit(0).cast("long")
    for i in range(int(bits)):
        z = (z
             + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z
