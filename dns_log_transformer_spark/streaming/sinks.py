"""Streaming sinks.

The reference emits one UDP syslog datagram per formatted line to a
hard-coded collector (/root/reference/app/app.py:17-32,253). Here the
syslog emit is a ``foreach`` writer that opens ONE socket per partition
(open/close lifecycle), not one per row — the sink-side batching the
reference lacks (SURVEY.md §4 "Batching at sink"). UDP is fire-and-forget;
delivery to the collector is inherently at-most-once even though the
pipeline itself replays from the checkpoint (documented honestly, the
reference has the same property).
"""

from __future__ import annotations

import logging
import socket

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

logger = logging.getLogger(__name__)

#: RFC3164 facility*8 + severity: daemon(3)*8 + info(6) = 30 — the
#: priority SysLogHandler(facility=LOG_DAEMON).info() sends
#: (app/app.py:21-22).
SYSLOG_PRI_DAEMON_INFO = 30


class SyslogWriter:
    """Row-level ForeachWriter: one UDP socket per partition.

    Spark calls open(partition_id, epoch_id) once per partition per epoch,
    process(row) per row, close(error) at the end — the socket lives for
    the whole partition. Rows must carry a ``line`` column.
    """

    def __init__(self, host: str, port: int = 514, pri: int = SYSLOG_PRI_DAEMON_INFO):
        self.host = host
        self.port = port
        self.pri = pri
        self._sock = None

    def open(self, partition_id: int, epoch_id: int) -> bool:  # noqa: ARG002
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        return True

    def process(self, row) -> None:
        datagram = f"<{self.pri}>{row.line}".encode("utf-8", errors="replace")
        self._sock.sendto(datagram, (self.host, self.port))

    def close(self, error) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None
        if error is not None:
            logger.error("syslog sink partition failed: %s", error)


def syslog_sink(
    lines: DataFrame, host: str, port: int, checkpoint_dir: str
) -> DataStreamWriter:
    """Configure (not start) the syslog foreach sink for a line stream."""
    return (
        lines.writeStream.foreach(SyslogWriter(host, port))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def parquet_archive_sink(
    df: DataFrame, path: str, checkpoint_dir: str
) -> DataStreamWriter:
    """Append-mode parquet archive — the durable upgrade of the
    reference's log-to-stdout diagnostics (app/app.py:223)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def quarantine_sink(rejects: DataFrame, path: str, checkpoint_dir: str) -> DataStreamWriter:
    """Dead-letter parquet stream for rows that failed decode/validation —
    replaces the reference's log-and-drop (app/app.py:229-231,255-263)."""
    return parquet_archive_sink(rejects, path, checkpoint_dir)
