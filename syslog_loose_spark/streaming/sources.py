"""Streaming source helpers — the Spark-native analogues of the
reference's UDP server example (/root/reference/examples/server/main.rs:
16-29), which reads one datagram per loop and calls parse_message on it.

Three ``readStream`` entry points, all emitting the pipeline's canonical
tokenized schema (doc_id, tokens, n_tok, source) so every downstream stage
(streaming_transform, windowed_counts, foreach_batch_writer) works
unchanged:

  * ``stream_tokenized_dir``  — file source over the tokenized parquet
    directory (the production shape: new files / Iceberg snapshots land
    and each becomes a micro-batch)
  * ``stream_socket_lines``   — socket source of raw syslog lines (the
    server example's direct analogue), tokenized JVM-side
  * ``stream_rate_synthetic`` — rate source mapped deterministically onto
    the golden corpus for load/demo runs

``tokens_from_text`` is pure JVM column logic (no Python boundary): the
string is encoded to UTF-8 and sliced byte-by-byte inside a transform(),
so token-array equality with the batch tokenizer holds exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..schema import TOKENIZED_SCHEMA
from ..sources.corpus import GOLDEN_CORPUS, SOURCES, _MIX, tokenize


def tokens_from_text(col: Column) -> Column:
    """UTF-8 byte tokens (array<int>) from a string column, JVM-side.
    Mirrors corpus.tokenize exactly: one int per byte."""
    b = F.encode(col, "UTF-8")
    # NB: plain 1-arg lambda (see CLAUDE.md — a default-arg capture
    # changes arity and binds the array-index column)
    return F.transform(
        F.sequence(F.lit(1), F.octet_length(b)),
        lambda i: F.conv(F.hex(b.substr(i, F.lit(1))), 16, 10).cast("int"),
    )


def raw_lines_to_tokenized(df: DataFrame, source: str = "socket",
                           value_col: str = "value",
                           doc_id: Column | None = None) -> DataFrame:
    """Raw text lines -> the canonical tokenized schema.  ``doc_id``
    defaults to uuid() (a socket has no replayable offset); pass a
    deterministic column when the source provides one."""
    toks = tokens_from_text(F.col(value_col))
    if doc_id is None:
        doc_id = F.expr("uuid()")
    return df.select(
        doc_id.cast("string").alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.lit(source).alias("source"),
    )


def stream_tokenized_dir(spark: SparkSession, path: str,
                         max_files_per_trigger: int | None = None
                         ) -> DataFrame:
    """File source over a tokenized parquet directory.  On an Iceberg
    input this is spark.readStream.format('iceberg') with the same
    downstream; the sandbox has no catalog, so parquet is the tested
    path."""
    r = spark.readStream.schema(TOKENIZED_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def stream_socket_lines(spark: SparkSession, host: str = "localhost",
                        port: int = 9999, source: str = "socket"
                        ) -> DataFrame:
    """Socket source of raw syslog lines — one line per row, tokenized
    JVM-side (the reference server's datagram loop, micro-batched)."""
    raw = (spark.readStream.format("socket")
           .option("host", host).option("port", port).load())
    return raw_lines_to_tokenized(raw, source)


def stream_rate_synthetic(spark: SparkSession,
                          rows_per_second: int = 1000) -> DataFrame:
    """Rate source mapped onto the golden corpus: row ``value`` i carries
    corpus line i % n and the same skewed arithmetic source assignment as
    the batch generator (corpus.source_for) — all JVM-side literals, no
    Python, deterministic per row id."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    n = len(GOLDEN_CORPUS)
    tok_lit = F.array(*[
        F.array(*[F.lit(t) for t in tokenize(line)])
        for _, line in GOLDEN_CORPUS])
    tail = F.array(*[F.lit(s) for s in SOURCES[1:]])
    # (value * _MIX) % 100 would overflow int64 for value >= ~3.5e9 and
    # silently diverge from corpus.source_for (exact Python ints); reduce
    # both factors mod 100 first — modular-arithmetic-equal, can't wrap
    h = ((F.col("value") % 100) * F.lit(_MIX % 100)) % 100
    source = (F.when(h < 60, F.lit(SOURCES[0]))
              .otherwise(F.element_at(
                  tail, (h % (len(SOURCES) - 1)).cast("int") + 1)))
    toks = F.element_at(tok_lit, (F.col("value") % n).cast("int") + 1)
    return rate.select(
        F.format_string("doc-%08d", F.col("value")).alias("doc_id"),
        toks.alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        source.alias("source"),
    )


class UdpToSocketBridge:
    """UDP datagram ingestion bridged into Spark's TCP socket source.

    Structured Streaming has no built-in UDP source (the socket source is
    a TCP *client*), but the reference's server example binds a UDP socket
    and parses one datagram per loop (examples/server/main.rs:16-29).
    This bridge reproduces that ingestion surface Spark-natively: syslog
    datagrams arriving on the UDP port are framed as newline-terminated
    lines (one message per datagram, RFC 5426 §3.1; a datagram that
    itself contains newlines will be split into multiple rows by the TCP
    line framing — no escaping is attempted) and fanned out to every
    connected TCP client, i.e. exactly the stream
    ``stream_socket_lines(spark, port=bridge.tcp_port)`` consumes.

    In production this role is played by any syslog relay (rsyslog,
    vector, fluent-bit) writing to Kafka/files; the bridge keeps the
    repo's UDP story self-contained and testable with stdlib only.
    """

    def __init__(self, host: str = "127.0.0.1", udp_port: int = 0,
                 tcp_port: int = 0):
        import socket as _socket
        import threading as _threading

        self._sock_mod = _socket
        self._threading = _threading
        self.host = host
        self._udp = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        self._udp.bind((host, udp_port))
        self.udp_port = self._udp.getsockname()[1]
        self._tcp = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._tcp.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._tcp.bind((host, tcp_port))
        self.tcp_port = self._tcp.getsockname()[1]
        self._tcp.listen(8)
        self._clients: list = []
        self._lock = _threading.Lock()
        self._stop = _threading.Event()
        self._threads: list = []

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._tcp.accept()
            except OSError:
                return
            with self._lock:
                self._clients.append(conn)

    def _udp_loop(self):
        while not self._stop.is_set():
            try:
                data, _ = self._udp.recvfrom(65535)
            except OSError:
                return
            line = data.rstrip(b"\n") + b"\n"
            with self._lock:
                live = []
                for c in self._clients:
                    try:
                        c.sendall(line)
                        live.append(c)
                    except OSError:
                        c.close()
                self._clients = live

    def start(self) -> "UdpToSocketBridge":
        for fn in (self._accept_loop, self._udp_loop):
            t = self._threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        for s in (self._udp, self._tcp):
            try:
                s.close()
            except OSError:
                pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients = []

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def stream_udp_datagrams(spark: SparkSession,
                         bridge: "UdpToSocketBridge",
                         source: str = "udp") -> DataFrame:
    """Tokenized stream of the datagrams a running UdpToSocketBridge
    receives — the end-to-end analogue of the reference's UDP server."""
    return stream_socket_lines(spark, bridge.host, bridge.tcp_port, source)
