"""In-process MySQL replica-protocol fixture server.

Speaks just enough of the public server side — HandshakeV10,
auth verification, COM_REGISTER_SLAVE / COM_BINLOG_DUMP, the event
stream with EOF heartbeats — to exercise the client transport
(`sources/wire.py`) byte-for-byte against generator-produced event
packets, with no network and no real server.  The serve loop is
deliberately strict: it validates the client's auth scramble and the
exact command layouts, so a client-side framing bug fails the session
instead of passing silently.
"""

from __future__ import annotations

import struct

from ..sources.wire import (
    CLIENT_COMPRESS,
    CLIENT_PLUGIN_AUTH,
    CLIENT_SECURE_CONNECTION,
    CLIENT_SSL,
    COM_BINLOG_DUMP,
    COM_QUERY,
    COM_QUIT,
    COM_REGISTER_SLAVE,
    MAX_PACKET_SIZE,
    CompressedTransport,
    PacketConn,
    WireError,
    scramble_caching_sha2,
    scramble_native_password,
    write_lenc_int,
    write_lenc_str,
)

SERVER_CAPABILITIES = 0x000FFFFF | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH

#: fixed handshake nonce: deterministic sessions, real 20-byte shape
NONCE = bytes(range(1, 21))


def build_handshake_v10(
    server_version: str = "10.11.6-MariaDB-log",
    connection_id: int = 42,
    nonce: bytes = NONCE,
    auth_plugin: str = "mysql_native_password",
    caps: int = SERVER_CAPABILITIES,
) -> bytes:
    return (
        bytes([10])
        + server_version.encode()
        + b"\x00"
        + struct.pack("<I", connection_id)
        + nonce[:8]
        + b"\x00"
        + struct.pack("<H", caps & 0xFFFF)
        + bytes([45])  # utf8mb4_general_ci
        + struct.pack("<H", 0x0002)  # status: autocommit
        + struct.pack("<H", caps >> 16)
        + bytes([len(nonce) + 1])
        + b"\x00" * 10
        + nonce[8:]
        + b"\x00"  # auth-part-2 is NUL-terminated on the wire
        + auth_plugin.encode()
        + b"\x00"
    )


#: a healthy-MariaDB session-setup surface (what the reference's
#: constructor queries expect to see); tests override entries to force
#: each validation failure
DEFAULT_SQL = {
    "SELECT @@global.binlog_format AS value": [{"value": "ROW"}],
    "SELECT @@global.binlog_row_image AS value": [{"value": "FULL"}],
    "SELECT @@global.binlog_row_metadata AS value": [{"value": "FULL"}],
    "SHOW MASTER STATUS": [{"File": "binlog.000002", "Position": 4}],
    "SHOW BINARY LOGS": [
        {"Log_name": "binlog.000002", "File_size": 4096},
        {"Log_name": "binlog.000001", "File_size": 1234},
        {"Log_name": "binlog.000010", "File_size": 8},
    ],
    'SHOW BINLOG EVENTS IN "binlog.000001" FROM 4 LIMIT 1': [{"Pos": 4}],
    "SELECT @@global.binlog_checksum AS value": [{"value": "CRC32"}],
    "SELECT @@global.binlog_annotate_row_events AS value": [{"value": "0"}],
}

_OK = b"\x00\x00\x00\x02\x00\x00\x00"
_EOF = b"\xfe\x00\x00\x02\x00"


def _send_resultset(conn: PacketConn, rows: list[dict]) -> None:
    """Text-protocol resultset: column count, ColumnDefinition41s, EOF,
    length-encoded rows (0xfb = NULL), EOF.  Column types are inferred
    from the python values so the client's typed conversion is
    exercised (LONGLONG / DOUBLE / VAR_STRING)."""
    names = list(rows[0].keys()) if rows else ["value"]

    def col_type(name: str) -> int:
        for r in rows:
            v = r.get(name)
            if isinstance(v, bool):
                continue
            if isinstance(v, int):
                return 0x08  # LONGLONG
            if isinstance(v, float):
                return 0x05  # DOUBLE
        return 0xFD  # VAR_STRING

    conn.send_packet(write_lenc_int(len(names)))
    for name in names:
        nb = name.encode()
        conn.send_packet(
            write_lenc_str(b"def")
            + write_lenc_str(b"")
            + write_lenc_str(b"")
            + write_lenc_str(b"")
            + write_lenc_str(nb)
            + write_lenc_str(nb)
            + write_lenc_int(0x0C)
            + struct.pack("<H", 33)  # charset
            + struct.pack("<I", 255)  # display length
            + bytes([col_type(name)])
            + struct.pack("<H", 0)  # flags
            + bytes([0])  # decimals
            + b"\x00\x00"  # filler
        )
    conn.send_packet(_EOF)
    for r in rows:
        body = b""
        for name in names:
            v = r.get(name)
            if v is None:
                body += b"\xfb"
            else:
                body += write_lenc_str(str(v).encode())
        conn.send_packet(body)
    conn.send_packet(_EOF)


def _send_large(conn: PacketConn, payload: bytes) -> None:
    """Server-side send that SPLITS payloads at MAX_PACKET_SIZE (the
    part of framing the client-side ``send_packet`` refuses): every
    full-size fragment promises a continuation, including the empty
    terminator when the length is an exact multiple."""
    off = 0
    while True:
        chunk = payload[off : off + MAX_PACKET_SIZE]
        conn.seq = (conn.seq + 1) & 0xFF
        conn._sock.sendall(
            struct.pack("<I", len(chunk))[:3] + bytes([conn.seq]) + chunk
        )
        off += len(chunk)
        if len(chunk) < MAX_PACKET_SIZE:
            return


def serve_session(
    sock,
    event_packets,
    user: str = "repl",
    password: str = "secret",
    server_version: str = "10.11.6-MariaDB-log",
    heartbeat_every: int = 0,
    wait_quit: bool = False,
    sql_responses: dict | None = None,
    seen: dict | None = None,
    auth_plugin: str = "mysql_native_password",
    sha2_full_auth: bool = False,
    auth_switch_to: str | None = None,
    switch_nonce: bytes | None = None,
    ssl_context=None,
    offer_ssl: bool = True,
    sha2_full_auth_ok: bool = False,
) -> dict:
    """One full replica session over ``sock``: handshake -> auth check ->
    REGISTER_SLAVE -> BINLOG_DUMP -> stream ``event_packets`` (each a
    framed event payload with its leading OK byte) -> close.  Returns
    what the server observed (for assertions).

    Auth modes: ``auth_plugin`` picks the greeting's plugin
    (mysql_native_password or caching_sha2_password); ``sha2_full_auth``
    makes the sha2 path demand full authentication (auth-cache miss);
    with ``sha2_full_auth_ok`` the server then accepts the cleartext
    password a TLS client sends (the real full-auth flow), otherwise it
    records the request and returns (the legacy must-fail path);
    ``auth_switch_to`` sends an AuthSwitchRequest to that plugin with a
    FRESH nonce after the initial response and verifies the re-scrambled
    reply.

    Transport modes: ``ssl_context`` (a server-side ``ssl.SSLContext``)
    accepts the client's SSLRequest and upgrades mid-handshake;
    ``offer_ssl=False`` masks CLIENT_SSL out of the greeting (for the
    client's server-refuses-TLS error path).  A client that negotiated
    CLIENT_COMPRESS gets the zlib compressed protocol from the first
    post-auth byte."""
    conn = PacketConn(sock)
    # observations land in the caller's dict IN PLACE, so a session the
    # client abandons mid-way (expected in error-path tests) still
    # exposes what the server saw up to that point
    if seen is None:
        seen = {}
    seen["errors"] = []

    server_caps = SERVER_CAPABILITIES
    if not offer_ssl:
        server_caps &= ~CLIENT_SSL
    conn.send_packet(
        build_handshake_v10(server_version, auth_plugin=auth_plugin, caps=server_caps),
        reset_seq=True,
    )
    resp = conn.read_packet()
    caps, _maxp, _cs = struct.unpack_from("<IIB", resp, 0)
    if caps & CLIENT_SSL and len(resp) == 32:
        # SSLRequest: upgrade the socket, then read the REAL
        # HandshakeResponse inside the tunnel (sequence continues)
        if ssl_context is None:
            raise WireError("client sent SSLRequest but server has no TLS context")
        seen["ssl_request_caps"] = caps  # must equal the response's caps
        conn._sock = ssl_context.wrap_socket(sock, server_side=True)
        seen["tls"] = True
        resp = conn.read_packet()
        caps, _maxp, _cs = struct.unpack_from("<IIB", resp, 0)
    body = resp[4 + 4 + 1 + 23 :]
    nul = body.index(b"\x00")
    got_user = body[:nul].decode()
    alen = body[nul + 1]
    got_auth = bytes(body[nul + 2 : nul + 2 + alen])
    seen["client_plugin"] = (
        body[nul + 2 + alen :].split(b"\x00")[0].decode() or None
        if len(body) > nul + 2 + alen
        else None
    )
    scramblers = {
        "mysql_native_password": scramble_native_password,
        "caching_sha2_password": scramble_caching_sha2,
    }
    seen["user"], seen["client_caps"] = got_user, caps

    def deny() -> dict:
        conn.send_packet(
            b"\xff" + struct.pack("<H", 1045) + b"#28000Access denied"
        )
        seen["errors"].append("auth")
        return seen

    cur_plugin, nonce = auth_plugin, NONCE
    if auth_switch_to is not None:
        # AuthSwitchRequest: 0xFE plugin NUL new-nonce NUL.  Callers can
        # pin switch_nonce (e.g. one ENDING IN 0x00 — a real server's
        # random scramble does ~1/256 of the time; the client must strip
        # only the single terminator NUL, never scramble bytes)
        cur_plugin = auth_switch_to
        nonce = bytes(range(101, 121)) if switch_nonce is None else switch_nonce
        conn.send_packet(
            b"\xfe" + cur_plugin.encode() + b"\x00" + nonce + b"\x00"
        )
        got_auth = bytes(conn.read_packet())
    want_auth = scramblers[cur_plugin](password, nonce)
    if got_user != user or got_auth != want_auth:
        return deny()
    if cur_plugin == "caching_sha2_password":
        if sha2_full_auth:
            conn.send_packet(b"\x01\x04")  # perform_full_authentication
            seen["errors"].append("sha2_full_auth_requested")
            if not sha2_full_auth_ok:
                return seen  # legacy path: client must fail actionably
            # real full-auth completion: the client sends the cleartext
            # password NUL-terminated inside the TLS tunnel
            clear = bytes(conn.read_packet())
            seen["full_auth_cleartext"] = True
            if clear != password.encode() + b"\x00":
                return deny()
        else:
            conn.send_packet(b"\x01\x03")  # fast_auth_success
    conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")  # OK
    if caps & CLIENT_COMPRESS:
        # compressed protocol from the first post-auth byte (public
        # protocol), both directions
        conn._sock = CompressedTransport(conn._sock)
        seen["compressed"] = True

    def expect_command() -> bytes:
        pkt = conn.read_packet()
        if conn.seq != 0:
            raise WireError("command did not reset sequence id")
        return pkt

    # S7 phase: answer ad-hoc text-protocol queries until the client
    # registers as a replica (the reference's constructor sequence)
    seen["queries"] = []
    canned = dict(DEFAULT_SQL)
    canned.update(sql_responses or {})
    while True:
        cmd = expect_command()
        if cmd[0] != COM_QUERY:
            break
        sql = cmd[1:].decode()
        seen["queries"].append(sql)
        if sql.startswith("SET "):
            conn.send_packet(_OK)
        elif sql in canned:
            _send_resultset(conn, canned[sql])
        else:
            conn.send_packet(
                b"\xff" + struct.pack("<H", 1064) + b"#42000Unknown query: " + sql.encode()
            )
    if cmd[0] != COM_REGISTER_SLAVE:
        raise WireError(f"expected COM_REGISTER_SLAVE, got 0x{cmd[0]:02x}")
    off = 1
    (seen["slave_id"],) = struct.unpack_from("<I", cmd, off)
    off += 4
    vals = []
    for _ in range(3):  # hostname, user, password — length-prefixed
        ln = cmd[off]
        off += 1
        vals.append(cmd[off : off + ln].decode())
        off += ln
    seen["register"] = vals
    seen["port"], seen["rank"], seen["master_id"] = struct.unpack_from(
        "<HII", cmd, off
    )
    if off + 10 != len(cmd):
        raise WireError("REGISTER_SLAVE payload has trailing bytes")
    conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")

    cmd = expect_command()
    if cmd[0] != COM_BINLOG_DUMP:
        raise WireError(f"expected COM_BINLOG_DUMP, got 0x{cmd[0]:02x}")
    seen["pos"], seen["flags"], seen["dump_slave_id"] = struct.unpack_from(
        "<IHI", cmd, 1
    )
    seen["binlog_file"] = cmd[11:].decode()
    conn.send_packet(b"\x00\x00\x00\x02\x00\x00\x00")

    n = 0
    for pkt in event_packets:
        if heartbeat_every and n and n % heartbeat_every == 0:
            conn.send_packet(b"\xfe\x00\x00\x00\x00")  # EOF heartbeat
        _send_large(conn, bytes(pkt))
        n += 1
    seen["events_sent"] = n

    # by default the server ends the stream by returning (the caller
    # closes the socket -> the client sees a clean end-of-stream); with
    # ``wait_quit`` it blocks for the client's COM_QUIT first (used when
    # the client stops early via max_events)
    if wait_quit:
        try:
            cmd = conn.read_packet()
            seen["quit"] = bool(cmd and cmd[0] == COM_QUIT)
        except WireError:
            seen["quit"] = False
    return seen
