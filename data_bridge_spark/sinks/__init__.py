from data_bridge_spark.sinks.writers import (
    write_fileshare,
    write_sftp,
    write_smtp,
    write_table,
)

__all__ = ["write_fileshare", "write_sftp", "write_smtp", "write_table"]
