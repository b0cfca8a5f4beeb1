"""As-of and range joins as shuffle-linear DataFrame compositions.

Spark has no native ASOF JOIN; the naive formulation (inequality join
+ row_number) is quadratic per key. Both operators here stay linear:

- ``asof_join``: union the two sides, single window pass per key
  ordered by time, carry the latest right-side payload forward with
  ``last(ignorenulls=True)``. One shuffle, no cross product —
  survives 100 TB provided keys aren't degenerate (AQE handles skew).
- ``range_join``: bucketize time to the window size, join each left
  bucket to right buckets {b-1, b} (candidate generation), then apply
  the exact range predicate. Shuffle is on (key, bucket) so candidate
  pairs are bounded by window density, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tolerance_ms: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: latest right row of the same key with
    right_time <= left_time. Left rows keep NULL payload when no right
    row precedes them.

    At equal timestamps the right row is considered visible (<=), which
    matches DuckDB ASOF JOIN semantics.
    """
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # Build the null-side struct types LOCALLY from the already-fetched
    # input schemas (round 12): the previous
    # right.select(...).schema["p"] spelling ran a full ANALYSIS round
    # trip per type — three per call — purely to learn types Python
    # already holds. Name lookup is case-INSENSITIVE like the analyzer
    # that resolves the matching F.col references (ADVICE r12: an
    # exact-case StructType index would KeyError on a differently-cased
    # payload arg that Spark itself resolves fine), and the schema's
    # own casing wins so the null literal's field names match the real
    # payload struct feeding unionByName.
    rschema = right.schema
    lschema = left.schema

    def _field(schema: StructType, name: str):
        try:
            return schema[name]
        except KeyError:
            return {f.name.lower(): f for f in schema.fields}[name.lower()]

    payload_type = StructType([_field(rschema, c) for c in right_payload])
    left_type = StructType([_field(lschema, c) for c in lcols])

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # sorts after right rows at equal time
        F.struct(*[F.col(c) for c in lcols]).alias("__left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(left_type).alias("__left"),
        payload_struct.alias("__payload"),
    )

    order = [F.col("__t").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        # Among right rows with identical time, prefer the greatest
        # tiebreak value (deterministic; matches "latest wins").
        r_tagged = r_tagged.withColumn("__tb", F.col("__payload").getField(tiebreak))
        l_tagged = l_tagged.withColumn(
            "__tb", F.lit(None).cast(_field(payload_type, tiebreak).dataType)
        )
        order.append(F.col("__tb").asc())

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        # Payload must carry its own right_time for tolerance checks.
        out = out.withColumn(
            "__asof",
            F.when(
                F.unix_millis(F.col("__t").cast("timestamp"))
                - F.unix_millis(
                    F.col("__asof").getField(right_time).cast("timestamp")
                )
                <= F.lit(tolerance_ms),
                F.col("__asof"),
            ),
        )
    return out.select(
        *[F.col("__left").getField(c).alias(c) for c in lcols],
        *[F.col("__asof").getField(c).alias(f"asof_{c}") for c in right_payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    window_ms: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with same key and 0 <= l.time - r.time <= window_ms.

    Bucketed candidate generation keeps the join equi-shaped so Spark
    uses a hash/sort-merge join instead of a broadcast-nested-loop.
    """
    bucket = lambda c: F.floor(F.unix_millis(F.col(c).cast("timestamp")) / window_ms)

    l = left.withColumn("__b", bucket(left_time))
    r = right.withColumn("__rb", bucket(right_time))
    # right row can be in the left row's bucket or the previous one
    r_expanded = r.withColumn("__b", F.explode(F.array(F.col("__rb"), F.col("__rb") + 1))).drop(
        "__rb"
    )
    joined = l.join(r_expanded, on=[on, "__b"], how=how)
    dt = F.unix_millis(F.col(left_time).cast("timestamp")) - F.unix_millis(
        F.col(right_time).cast("timestamp")
    )
    return joined.filter((dt >= 0) & (dt <= window_ms)).drop("__b")
