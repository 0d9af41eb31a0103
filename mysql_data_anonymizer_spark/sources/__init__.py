from mysql_data_anonymizer_spark.sources.files import read_table
from mysql_data_anonymizer_spark.sources.jdbc import jdbc_reader, JdbcConfig

__all__ = ["read_table", "jdbc_reader", "JdbcConfig"]
