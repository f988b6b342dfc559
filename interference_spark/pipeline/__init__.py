"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition up to cluster parallelism when the source arrives in too
    few partitions (a single small parquet file scans as ONE partition, so a
    Pandas-UDF stage would run on one core). At 100 TB inputs span thousands
    of row groups and this is a no-op; at test SFs it keeps every core busy."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
