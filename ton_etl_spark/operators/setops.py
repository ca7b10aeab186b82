"""Set-operation helpers.

  * exclude_rows — the reference's out-of-band corrections mechanism:
    an `excluded_rows` table anti-joined against the data on replay
    (datalake/README.md:370-401, athena_ddl.sql:386-400).
  * except_dedup — the re-export dedup of the repartition job:
    `EXCEPT select .. from target` before appending
    (datalake/repartition.py:98-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exclude_rows(
    df: DataFrame, exclusions: DataFrame, on: list[str]
) -> DataFrame:
    """Anti-join corrections: exclusions are small -> broadcast."""
    return df.join(F.broadcast(exclusions.select(*on).distinct()), on=on,
                   how="left_anti")


def except_dedup(new_rows: DataFrame, target: DataFrame) -> DataFrame:
    """Rows of new_rows not already present in target (plain EXCEPT —
    set semantics, like the reference's Athena query)."""
    return new_rows.subtract(target.select(*new_rows.columns))
