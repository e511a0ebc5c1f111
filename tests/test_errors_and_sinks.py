"""Tests for the logging/error layer and the SFTP sink/source transports."""

from __future__ import annotations

import logging
import os

import pytest

from data_bridge_spark.plans.errors import log_and_reraise, stream_logger
from data_bridge_spark.plans.models import DestSftp, SourceSftp
from data_bridge_spark.sinks.writers import write_sftp
from data_bridge_spark.sources.readers import read_sftp_source


def test_stream_logger_injects_name(tmp_path):
    log_file = str(tmp_path / "s.log")
    logger = stream_logger("my_stream", log_file=log_file)
    logger.info("hello")
    for h in logger.handlers:
        h.flush()
    assert "[my_stream]" in open(log_file).read()


def test_stream_logger_idempotent_handlers():
    a = stream_logger("dup_stream")
    b = stream_logger("dup_stream")
    # ref bug #14: handlers accumulated per instantiation; ours must not
    assert a is b and len(a.handlers) == 1


def test_log_and_reraise(tmp_path, caplog):
    logger = logging.getLogger("test_lar")

    @log_and_reraise(logger)
    def boom():
        raise ValueError("kapow")

    with caplog.at_level(logging.ERROR, logger="test_lar"):
        with pytest.raises(ValueError, match="kapow"):
            boom()
    assert any("terminal error" in r.message for r in caplog.records)


class FakeSftpTransport:
    """Duck-types the put/get surface of an SFTP client."""

    def __init__(self):
        self.ops = []

    def put(self, local, remote):
        self.ops.append(("put", local, remote))
        assert os.path.exists(local)

    def get(self, remote, local):
        self.ops.append(("get", remote, local))
        # serve a small csv "from the remote host"
        with open(local, "w") as f:
            f.write("id,name\n1,alpha\n2,beta\n")


def test_write_sftp_with_fake_transport(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    dest = DestSftp(name="up", host="fake", remote_dir="/in")
    transport = FakeSftpTransport()
    resp = write_sftp(df, dest, "data.csv", transport=transport)
    assert resp.status == "success" and resp.records_processed == 2
    assert transport.ops and transport.ops[0][0] == "put"
    assert transport.ops[0][2] == "/in/data.csv"


def test_read_sftp_with_fake_transport(spark, tmp_path):
    src = SourceSftp(name="dl", host="fake", remote_path="/out/data.csv", format="csv")
    df = read_sftp_source(spark, src, staging_dir=str(tmp_path), transport=FakeSftpTransport())
    rows = {(r.id, r.name) for r in df.collect()}
    assert rows == {("1", "alpha"), ("2", "beta")}


def test_write_sftp_failure_is_reported(spark):
    class FailingTransport:
        def put(self, local, remote):
            raise OSError("connection refused")

    df = spark.createDataFrame([(1,)], "id int")
    resp = write_sftp(df, DestSftp(name="up", host="x"), "f.csv", transport=FailingTransport())
    assert resp.status == "failure" and "connection refused" in resp.message
