from mysql_data_anonymizer_spark.functions.generator import (
    DeterministicGenerator,
    PyRowGenerator,
)
from mysql_data_anonymizer_spark.functions.rownum import with_row_index

__all__ = ["DeterministicGenerator", "PyRowGenerator", "with_row_index"]
