"""Sources & sinks (SURVEY.md §2.1)."""

from .readers import read_csv_staged, read_parquet, read_pipe_csv, read_testdata  # noqa: F401
from .writers import write_partitioned, write_jdbc  # noqa: F401
