"""Socket-served SQLite DBAPI: a wire boundary for the broker.

``DBAPIBroker`` is dialect-generic, but in this container every
binding it could be tested against lives in-process (the sqlite3
driver opens a local file; no Postgres server exists). This module
provides the genuine wire boundary the contract suite needs (VERDICT
r06 item 6): a TCP server that owns per-client ``sqlite3``
connections to one shared database file, and a client-side DBAPI-2.0
shim that forwards exactly the surface ``DBAPIBroker`` uses —
``cursor()``, ``cursor.execute(sql, params)``, ``fetchone``,
``fetchall``, ``commit``, ``rollback``, ``close``.

What crosses the socket is what would cross it to a served database:
SQL text, bound parameters, result rows — length-prefixed JSON
frames, one request in flight per connection (``JobStore`` already
serializes backend calls under its RLock). Each client connection
gets its OWN server-side sqlite connection (WAL + busy_timeout +
autocommit), so transaction semantics — ``BEGIN IMMEDIATE`` writer
locks spanning multiple round-trips until ``commit``/``rollback`` —
are exactly the multi-connection semantics a worker fleet sees.
Errors re-raise client-side as :class:`NetDBAPIError` (the broker's
rollback-and-reraise handlers catch ``BaseException``).

Also usable as a minimal single-host deployment: one ``serve()``
process makes a file-backed broker reachable from other machines the
way a served Postgres would be, without the server dependency.
"""

from __future__ import annotations

import json
import socket
import sqlite3
import struct
import threading

paramstyle = "qmark"
apilevel = "2.0"
threadsafety = 1


class NetDBAPIError(Exception):
    """Server-side database error, re-raised client-side."""


# -- framing ---------------------------------------------------------------

def _send(sock: socket.socket, obj) -> None:
    payload = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _recv(sock: socket.socket):
    header = _recv_exact(sock, 4)
    (n,) = struct.unpack(">I", header)
    return json.loads(_recv_exact(sock, n).decode())


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("netdbapi peer closed mid-frame")
        buf += chunk
    return buf


# -- server ----------------------------------------------------------------

class NetDBAPIServer:
    """Thread-per-client TCP front end over one SQLite file."""

    def __init__(self, db_path: str, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        self._db_path = db_path
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(64)
        self.address: tuple[str, int] = self._sock.getsockname()
        self._stopping = threading.Event()
        self._accept_thread: threading.Thread | None = None

    def start(self) -> tuple[str, int]:
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name="netdbapi-accept", daemon=True
        )
        self._accept_thread.start()
        return self.address

    def stop(self) -> None:
        self._stopping.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def _accept_loop(self) -> None:
        while not self._stopping.is_set():
            try:
                client, _ = self._sock.accept()
            except OSError:
                return  # socket closed by stop()
            threading.Thread(
                target=self._serve_client, args=(client,),
                name="netdbapi-client", daemon=True,
            ).start()

    def _serve_client(self, client: socket.socket) -> None:
        # Per-client connection: the same isolation a fleet of worker
        # processes gets from their own drivers against one database.
        db = sqlite3.connect(self._db_path, isolation_level=None)
        db.execute("PRAGMA journal_mode=WAL")
        db.execute("PRAGMA busy_timeout=10000")
        cur = db.cursor()
        try:
            while True:
                try:
                    req = _recv(client)
                except (ConnectionError, OSError):
                    return
                op = req[0]
                try:
                    if op == "execute":
                        cur.execute(req[1], req[2])
                        _send(client, {"ok": 1})
                    elif op == "fetchone":
                        row = cur.fetchone()
                        _send(client, {"ok": 1, "row": row})
                    elif op == "fetchall":
                        _send(client, {"ok": 1, "rows": cur.fetchall()})
                    elif op == "commit":
                        db.commit()
                        _send(client, {"ok": 1})
                    elif op == "rollback":
                        db.rollback()
                        _send(client, {"ok": 1})
                    elif op == "close":
                        _send(client, {"ok": 1})
                        return
                    else:
                        _send(client, {"err": f"unknown op {op!r}"})
                except sqlite3.Error as ex:
                    _send(client, {"err": f"{type(ex).__name__}: {ex}"})
        finally:
            try:
                db.rollback()  # abandon any in-flight txn on disconnect
            except sqlite3.Error:
                pass
            db.close()
            client.close()


def serve(db_path: str, host: str = "127.0.0.1",
          port: int = 0) -> NetDBAPIServer:
    """Start a server; returns it with ``.address`` bound."""
    server = NetDBAPIServer(db_path, host, port)
    server.start()
    return server


# -- client (DBAPI subset) -------------------------------------------------

class NetCursor:
    def __init__(self, conn: "NetConnection") -> None:
        self._conn = conn

    def execute(self, sql: str, params=()) -> "NetCursor":
        self._conn._call(["execute", sql, list(params)])
        return self

    def fetchone(self):
        row = self._conn._call(["fetchone"]).get("row")
        return None if row is None else tuple(row)

    def fetchall(self):
        return [tuple(r) for r in self._conn._call(["fetchall"])["rows"]]

    def close(self) -> None:  # per-call cursors server-side: nothing held
        pass


class NetConnection:
    def __init__(self, host: str, port: int, timeout: float = 30.0) -> None:
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._lock = threading.Lock()

    def _call(self, req):
        with self._lock:
            _send(self._sock, req)
            resp = _recv(self._sock)
        if "err" in resp:
            raise NetDBAPIError(resp["err"])
        return resp

    def cursor(self) -> NetCursor:
        return NetCursor(self)

    def commit(self) -> None:
        self._call(["commit"])

    def rollback(self) -> None:
        self._call(["rollback"])

    def close(self) -> None:
        try:
            self._call(["close"])
        except (NetDBAPIError, ConnectionError, OSError):
            pass
        self._sock.close()


def connect(host: str, port: int | str, timeout: float | str = 30.0) -> NetConnection:
    """DBAPI-style entry point. String-typed ``port``/``timeout`` are
    accepted because the config layer's ``job_store_dbapi_options``
    are TOML-string-typed (``job_store_dbapi =
    "dungbeetle_spark.netdbapi:connect"`` +
    ``job_store_dbapi_options = {host = "...", port = "6060"}``)."""
    return NetConnection(host, int(port), float(timeout))
