from nass_summary_spark.sources.readers import (
    read_csv_clean,
    read_json_records,
    read_parquet,
)
from nass_summary_spark.sources.writers import write_csv, write_parquet

__all__ = [
    "read_csv_clean",
    "read_json_records",
    "read_parquet",
    "write_csv",
    "write_parquet",
]
