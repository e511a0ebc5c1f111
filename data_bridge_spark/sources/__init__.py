from data_bridge_spark.sources.readers import read_file_source, read_jdbc, read_sftp_source

__all__ = ["read_file_source", "read_jdbc", "read_sftp_source"]
