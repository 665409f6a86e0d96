"""TLS + compressed-protocol tests for the wire transport.

The reference DECLARES both capabilities without implementing them
(`/root/reference/src/Connection/Capability.php:35-37` COMPRESS/ZSTD,
`:65-67,162` SSL / SSL_VERIFY_SERVER_CERT); this engine implements them:
TLS upgrade mid-handshake (SSLRequest -> wrap -> HandshakeResponse),
caching_sha2_password FULL auth inside the tunnel, and zlib packet
framing from the first post-auth byte.  Certificates are a committed
self-signed fixture (CN=localhost, SAN DNS:localhost + IP:127.0.0.1,
100-year validity) under ``tests/tls/``.
"""

from __future__ import annotations

import os
import socket
import ssl
import struct
import threading

import pytest

from mysql_binlog_ray.fixtures.wire_server import serve_session
from mysql_binlog_ray.sources.wire import (
    BinlogWireClient,
    CompressedTransport,
    WireError,
    tail_to_shards,
)

TLS_DIR = os.path.join(os.path.dirname(__file__), "tls")
CERT = os.path.join(TLS_DIR, "server.pem")
KEY = os.path.join(TLS_DIR, "server.key")


def server_ctx() -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(CERT, KEY)
    return ctx


def client_ctx(check_hostname: bool) -> ssl.SSLContext:
    # chain verification against the pinned self-signed cert; hostname
    # checks only make sense over TCP (socketpairs have no peer name)
    ctx = ssl.create_default_context(cafile=CERT)
    if not check_hostname:
        ctx.check_hostname = False
    return ctx


def _serve_in_thread(sock, payloads, **kw):
    out: dict = {}

    def run():
        try:
            serve_session(sock, payloads, seen=out, **kw)
        except Exception as e:
            out["exception"] = repr(e)
        finally:
            sock.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t, out


def _event_payloads(manifest) -> list[bytes]:
    import pyarrow.parquet as pq

    payloads = []
    for s in manifest["shards"]:
        payloads.extend(
            pq.read_table(s["path"], columns=["payload"])["payload"].to_pylist()
        )
    return payloads


class TestTlsHandshake:
    def test_handshake_and_query_over_tls_socketpair(self):
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(srv, [], ssl_context=server_ctx(), wait_quit=False)
        c = BinlogWireClient(
            cli, user="repl", password="secret", ssl_context=client_ctx(False)
        )
        c.handshake()
        assert c.tls_active
        rows = c.query("SELECT @@global.binlog_format AS value")
        assert rows == [{"value": "ROW"}]
        cli.close()
        t.join(timeout=10)
        assert seen.get("tls") is True
        assert seen["errors"] == []

    def test_full_verification_over_tcp(self, small_stream, tmp_path):
        """Real TCP + full certificate AND hostname/IP verification (the
        cert's SAN carries IP:127.0.0.1): the managed-MySQL connection
        shape, end-to-end through tail_to_shards."""
        spec, out, manifest = small_stream
        payloads = _event_payloads(manifest)

        lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(1)
        port = lsock.getsockname()[1]
        seen: dict = {}

        def serve():
            try:
                conn, _ = lsock.accept()
                try:
                    serve_session(conn, payloads, seen=seen, ssl_context=server_ctx())
                finally:
                    conn.close()
            except Exception as e:
                seen["exception"] = repr(e)
            finally:
                lsock.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        client = BinlogWireClient.connect(
            "127.0.0.1",
            port,
            user="repl",
            password="secret",
            ssl_context=client_ctx(True),  # hostname verification ON
        )
        spool = str(tmp_path / "spool")
        res = tail_to_shards(
            client, spool, shard_events=64, binlog_file="binlog.000001",
        )
        t.join(timeout=30)
        assert "exception" not in seen, seen
        assert seen.get("tls") is True
        assert client.tls_active
        assert res["events"] == len(payloads) == seen["events_sent"]

    def test_tls_refused_when_server_lacks_ssl(self):
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(srv, [], offer_ssl=False)
        c = BinlogWireClient(
            cli, user="repl", password="secret", ssl_context=client_ctx(False)
        )
        with pytest.raises(WireError, match="did not offer CLIENT_SSL"):
            c.handshake()
        cli.close()
        t.join(timeout=10)

    def test_wrong_ca_fails_verification(self):
        """A client pinned to a DIFFERENT CA must refuse the server cert
        (no silent fallback to plaintext)."""
        import tempfile

        # self-signed "wrong CA": any other cert will do — generate is
        # overkill; use the system default store, which does not contain
        # our self-signed fixture
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(srv, [], ssl_context=server_ctx())
        ctx = ssl.create_default_context()  # system store: fixture not in it
        ctx.check_hostname = False
        c = BinlogWireClient(cli, user="repl", password="secret", ssl_context=ctx)
        with pytest.raises(ssl.SSLError):
            c.handshake()
        cli.close()
        t.join(timeout=10)


class TestSha2FullAuth:
    def test_full_auth_completes_over_tls(self):
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(
            srv,
            [],
            auth_plugin="caching_sha2_password",
            sha2_full_auth=True,
            sha2_full_auth_ok=True,
            ssl_context=server_ctx(),
        )
        c = BinlogWireClient(
            cli, user="repl", password="secret", ssl_context=client_ctx(False)
        )
        c.handshake()
        rows = c.query("SELECT @@global.binlog_format AS value")
        assert rows == [{"value": "ROW"}]
        cli.close()
        t.join(timeout=10)
        assert seen.get("full_auth_cleartext") is True
        assert "sha2_full_auth_requested" in seen["errors"]

    def test_full_auth_wrong_password_denied_over_tls(self):
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(
            srv,
            [],
            auth_plugin="caching_sha2_password",
            sha2_full_auth=True,
            sha2_full_auth_ok=True,
            ssl_context=server_ctx(),
        )
        c = BinlogWireClient(
            cli, user="repl", password="WRONG", ssl_context=client_ctx(False)
        )
        with pytest.raises(WireError, match="Access denied"):
            c.handshake()
        cli.close()
        t.join(timeout=10)

    def test_full_auth_still_fails_actionably_without_tls(self):
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(
            srv, [], auth_plugin="caching_sha2_password", sha2_full_auth=True
        )
        c = BinlogWireClient(cli, user="repl", password="secret")
        with pytest.raises(WireError, match="enable.*TLS|prime the server"):
            c.handshake()
        cli.close()
        t.join(timeout=10)
        assert "sha2_full_auth_requested" in seen["errors"]


class TestCompressedProtocol:
    def test_transport_framing_raw_and_compressed(self):
        """Tiny payloads ship raw (uncompressed length 0); compressible
        payloads ship zlib'd; both round-trip byte-exactly, including a
        read split across recv calls."""
        a, b = socket.socketpair()
        ta, tb = CompressedTransport(a), CompressedTransport(b)
        small = b"hi"
        big = b"abc123" * 600
        incompressible = os.urandom(80)
        for payload in (small, big, incompressible):
            ta.sendall(payload)
            got = b""
            while len(got) < len(payload):
                got += tb.recv(len(payload) - len(got))
            assert got == payload
        # frame inspection: resend and peek at the raw socket bytes
        c, d = socket.socketpair()
        tc = CompressedTransport(c)
        tc.sendall(small)
        hdr = d.recv(7)
        assert hdr[4:7] == b"\x00\x00\x00"  # raw (uncompressed len 0)
        d.recv(len(small))
        tc.sendall(big)
        hdr = d.recv(7)
        ulen = hdr[4] | (hdr[5] << 8) | (hdr[6] << 16)
        clen = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16)
        assert ulen == len(big) and clen < len(big)  # genuinely compressed
        for s in (a, b, c, d):
            s.close()

    def test_tail_over_compressed_protocol(self, small_stream, tmp_path):
        spec, out, manifest = small_stream
        payloads = _event_payloads(manifest)
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(srv, payloads)
        client = BinlogWireClient(cli, user="repl", password="secret", compress=True)
        spool = str(tmp_path / "spool")
        res = tail_to_shards(
            client, spool, shard_events=64, binlog_file="binlog.000001",
        )
        cli.close()
        t.join(timeout=30)
        assert "exception" not in seen, seen
        assert seen.get("compressed") is True
        assert client.compress_active
        assert res["events"] == len(payloads) == seen["events_sent"]

    def test_tail_over_tls_plus_compression(self, small_stream, tmp_path):
        """Both upgrades stacked: TLS at handshake, zlib after auth —
        the transport order a real WAN replica link would use.  The
        SSLRequest must carry the SAME capability flags as the
        HandshakeResponse (public protocol; a server latching caps from
        the SSLRequest must learn CLIENT_COMPRESS there)."""
        spec, out, manifest = small_stream
        payloads = _event_payloads(manifest)
        srv, cli = socket.socketpair()
        t, seen = _serve_in_thread(srv, payloads, ssl_context=server_ctx())
        client = BinlogWireClient(
            cli,
            user="repl",
            password="secret",
            ssl_context=client_ctx(False),
            compress=True,
        )
        spool = str(tmp_path / "spool")
        res = tail_to_shards(
            client, spool, shard_events=64, binlog_file="binlog.000001",
        )
        cli.close()
        t.join(timeout=30)
        assert "exception" not in seen, seen
        assert seen.get("tls") is True and seen.get("compressed") is True
        assert seen["ssl_request_caps"] == seen["client_caps"]
        assert res["events"] == len(payloads) == seen["events_sent"]

    def test_large_frame_reassembly_through_compression(self):
        """>16MB inner packets still reassemble when tunneled through the
        compressed transport (the framing layers are independent)."""
        from mysql_binlog_ray.fixtures.wire_server import _send_large
        from mysql_binlog_ray.sources.wire import MAX_PACKET_SIZE, PacketConn

        a, b = socket.socketpair()
        ca = PacketConn(CompressedTransport(a))
        cb = PacketConn(CompressedTransport(b))
        payload = bytes(range(256)) * ((MAX_PACKET_SIZE + 100_000) // 256)
        t = threading.Thread(target=_send_large, args=(ca, payload), daemon=True)
        t.start()
        got = cb.read_packet()
        t.join(timeout=30)
        assert got == payload
        a.close()
        b.close()


class TestDaemonTlsCli:
    def test_daemon_tail_with_ssl_ca_over_tcp(self, small_stream, tmp_path, capsys):
        """CLI plumbing: --ssl-ca pins the fixture CA; the tail runs over
        TLS end to end."""
        import json

        from mysql_binlog_ray import daemon

        spec, out, manifest = small_stream
        payloads = _event_payloads(manifest)
        lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(1)
        port = lsock.getsockname()[1]
        seen: dict = {}

        def serve():
            try:
                conn, _ = lsock.accept()
                try:
                    serve_session(conn, payloads, seen=seen, ssl_context=server_ctx())
                finally:
                    conn.close()
            except Exception as e:
                seen["exception"] = repr(e)
            finally:
                lsock.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        spool = str(tmp_path / "spool")
        rc = daemon.main(
            [
                "tail",
                "--host", "127.0.0.1",
                "--port", str(port),
                "--user", "repl",
                "--password", "secret",
                "--out-dir", spool,
                "--binlog-file", "binlog.000001",
                "--shard-events", "64",
                "--ssl-ca", CERT,
            ]
        )
        t.join(timeout=30)
        assert rc == 0
        assert "exception" not in seen, seen
        assert seen.get("tls") is True
        summary = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )
        assert summary["events"] == len(payloads)
