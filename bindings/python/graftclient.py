"""Stdlib-only Python client for the graft wire server.

Mirrors the reference SDK's API shape (reference
bindings/python/opentick/client.py): ``connect()`` returns a
``Connection`` with ``execute`` / ``execute_async`` / ``batch_insert`` /
``use`` / ``login`` / meta helpers; async calls return ``Future``s with
``get(timeout)``; ``split_range`` supports scatter-gather range queries.

Wire format (engine/Server.scala): 4-byte little-endian length frames
carrying BSON documents by default (codec hand-implemented below from
the public BSON spec — independent of the server's Scala codec), or
JSON after a ``protocol=json`` first frame (``connect(...,
protocol='json')``). Request ``{"0": ticket, "1": cmd, "2": sql or
prepared id, "3": args, "4": useCache}``; response ``{"0": ticket,
"1": result}`` where a string result is an error. A 1-byte ``H`` frame
is a heartbeat probe answered with an empty frame. Timestamps travel as
``[epoch_seconds, nanos]`` pairs: pass ``datetime`` (UTC assumed) or
``(sec, nsec)`` tuples as arguments; result cells come back as
``datetime`` when the nanos fit microseconds, else ``(sec, nsec)``
tuples so no precision is ever lost.

Only the Python standard library is used: socket, struct, json,
threading, datetime.
"""

import datetime
import json
import socket
import struct
import threading

__all__ = ["Error", "connect", "split_range", "Connection", "Future"]


class Error(RuntimeError):
    pass


def split_range(start, end, num_parts):
    """Split [start, end] into contiguous sub-ranges, reference
    semantics: truncated per-part width, last part absorbs the
    remainder. Returns [] when num_parts <= 1."""
    if num_parts <= 1:
        return []
    d = (end - start) // num_parts if isinstance(start, int) else \
        (end - start) / num_parts
    parts = [(start + i * d, start + (i + 1) * d) for i in range(num_parts)]
    parts[-1] = (parts[-1][0], end)
    return parts


def connect(addr="localhost", port=1116, db_name=None, timeout=30.0,
            protocol="bson"):
    """Default protocol is BSON, like the reference SDK; pass
    protocol='json' to negotiate the alternate JSON mode."""
    conn = Connection(addr, port, timeout=timeout, protocol=protocol)
    conn.start()
    if db_name:
        conn.use(db_name)
    return conn


# ── BSON codec (public spec, bsonspec.org) — stdlib struct only ──

def _bson_encode(doc):
    return _bson_doc(doc.items())


def _bson_doc(items):
    body = b"".join(_bson_elem(str(k), v) for k, v in items)
    return struct.pack("<i", 4 + len(body) + 1) + body + b"\x00"


def _bson_elem(name, v):
    key = name.encode("utf-8") + b"\x00"
    if v is None:
        return b"\x0a" + key
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        if -2147483648 <= v <= 2147483647:
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return b"\x02" + key + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if isinstance(v, (list, tuple)):
        return b"\x04" + key + _bson_doc(enumerate(v))
    if isinstance(v, dict):
        return b"\x03" + key + _bson_doc(v.items())
    raise Error("BSON: unsupported value %r" % (v,))


def _bson_decode(data):
    doc, end = _bson_read_doc(data, 0)
    return doc


def _bson_read_doc(data, pos):
    (total,) = struct.unpack_from("<i", data, pos)
    end = pos + total - 1  # terminator byte
    pos += 4
    doc = {}
    while pos < end:
        tpe = data[pos]
        pos += 1
        z = data.index(b"\x00", pos)
        name = data[pos:z].decode("utf-8")
        pos = z + 1
        val, pos = _bson_read_value(data, pos, tpe)
        doc[name] = val
    if data[end] != 0:
        raise Error("BSON: missing document terminator")
    return doc, end + 1


def _bson_read_value(data, pos, tpe):
    if tpe == 0x01:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if tpe == 0x02:
        (n,) = struct.unpack_from("<i", data, pos)
        s = data[pos + 4:pos + 4 + n - 1].decode("utf-8")
        return s, pos + 4 + n
    if tpe == 0x03:
        return _bson_read_doc(data, pos)
    if tpe == 0x04:
        doc, pos = _bson_read_doc(data, pos)
        return [doc[k] for k in sorted(doc, key=int)], pos
    if tpe == 0x05:  # binary: tolerated from foreign encoders
        (n,) = struct.unpack_from("<i", data, pos)
        return bytes(data[pos + 5:pos + 5 + n]), pos + 5 + n
    if tpe == 0x08:
        return data[pos] != 0, pos + 1
    if tpe == 0x09:  # foreign UTC datetime, ms
        (ms,) = struct.unpack_from("<q", data, pos)
        return datetime.datetime.fromtimestamp(
            ms / 1000.0, tz=datetime.timezone.utc), pos + 8
    if tpe == 0x0A:
        return None, pos
    if tpe == 0x10:
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if tpe == 0x11:  # Mongo timestamp: opaque uint64, tolerated
        return struct.unpack_from("<Q", data, pos)[0], pos + 8
    if tpe == 0x12:
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    raise Error("BSON: unsupported element type 0x%02x" % tpe)


_EPOCH = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


def _to_wire(v):
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        # calendar-exact integer math: int(v.timestamp()) truncates
        # toward zero, shifting pre-epoch fractional seconds forward a
        # second; timedelta normalizes to (days, secs, micros>=0), which
        # matches the [sec, nsec>=0] wire convention exactly
        td = v - _EPOCH
        sec = td.days * 86400 + td.seconds
        return [sec, td.microseconds * 1000]
    if isinstance(v, tuple) and len(v) == 2:
        return [v[0], v[1]]
    if isinstance(v, (list, tuple)):
        return [_to_wire(x) for x in v]
    return v


def _cell(c):
    """Timestamp cells are [sec, nsec] int pairs (never whole rows —
    decoding is strictly two-level, like the reference client)."""
    if isinstance(c, list) and len(c) == 2 and \
            all(isinstance(x, int) and not isinstance(x, bool) for x in c):
        sec, nsec = c
        if nsec % 1000 == 0:
            return datetime.datetime.fromtimestamp(
                sec, tz=datetime.timezone.utc) + \
                datetime.timedelta(microseconds=nsec // 1000)
        return (sec, nsec)  # sub-microsecond: keep exact
    return c


def _from_wire(v):
    if isinstance(v, list):
        return [[_cell(c) for c in row] if isinstance(row, list) else row
                for row in v]
    return v


class Future(object):
    def __init__(self):
        self._event = threading.Event()
        self._value = None

    def _complete(self, value):
        self._value = value
        self._event.set()

    def get(self, timeout=None):
        if not self._event.wait(timeout):
            raise Error("Timeout")
        v = self._value
        if isinstance(v, str):
            raise Error(v)
        if isinstance(v, Exception):
            raise v
        return _from_wire(v) if isinstance(v, list) else v


class Connection(object):
    def __init__(self, addr, port, timeout=30.0, protocol="bson"):
        if protocol not in ("bson", "json"):
            raise Error("unknown protocol %s" % protocol)
        self._addr = addr
        self._port = port
        self._timeout = timeout
        self._protocol = protocol
        self._sock = None
        self._wlock = threading.Lock()
        self._plock = threading.Lock()
        self._pending = {}
        self._chunks = {}  # ticket -> buffered chunked-response rows
        self._prepared = {}  # sql -> server prepared id
        self._ticket = 0
        self._reader = None
        self._closed = False

    # ── lifecycle ──

    def start(self):
        self._sock = socket.create_connection((self._addr, self._port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        # BSON is the negotiated default; only JSON announces itself
        if self._protocol == "json":
            self._write_frame(b"protocol=json")
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def close(self):
        self._closed = True
        try:
            self._sock.close()
        except OSError:
            pass

    # ── public API (reference client.py shape) ──

    def login(self, username, password):
        self._call_sync("login", "%s %s" % (username, password))

    def use(self, db_name):
        self._call_sync("use", db_name)

    def execute(self, sql, args=[], cache=False):
        return self.execute_async(sql, args, cache).get(self._timeout)

    def execute_chunked(self, sql, args=[], chunk_rows=10000):
        """SELECT with a CHUNKED response (wire key "5"): the server
        streams the result as chunk_rows-sized same-ticket frames
        ({"2": 1} = more follows), so results past its single-frame
        maxWireRows bound arrive complete. The future completes on the
        stream's final frame; an error final frame voids the prefix."""
        if chunk_rows <= 0:
            raise Error("chunk_rows must be positive")
        return self._call("run", sql, [_to_wire(a) for a in args] or None,
                          chunk_rows=chunk_rows).get(self._timeout)

    def execute_async(self, sql, args=[], cache=False):
        sql_or_id = sql
        if cache:
            # the server's response cache only engages for prepared ids
            sql_or_id = self.prepare(sql)
        return self._call("run", sql_or_id,
                          [_to_wire(a) for a in args] or None,
                          cache)

    def prepare(self, sql):
        with self._plock:
            if sql in self._prepared:
                return self._prepared[sql]
        pid = self._call_sync("prepare", sql)
        with self._plock:
            self._prepared[sql] = pid
        return pid

    def batch_insert(self, sql, args_array):
        pid = self.prepare(sql)
        self._call("batch", pid,
                   [[_to_wire(a) for a in row] for row in args_array]) \
            .get(self._timeout)

    def execute_ranges(self, sql, parts):
        """Scatter-gather: one pipelined query per (lo, hi) part over
        this connection, plus one point query per junction boundary to
        measure EXACTLY how many rows sit at each shared (inclusive)
        boundary value — that head run of the next part is dropped.
        Exact for any projection; exclusive-bound SQL measures overlap
        0 and concatenates plainly."""
        futures = [self.execute_async(sql, [lo, hi]) for lo, hi in parts]
        overlaps = [self.execute_async(sql, [hi1, hi1])
                    if hi1 == lo2 else None
                    for (_, hi1), (lo2, _) in zip(parts, parts[1:])]
        merged = list(futures[0].get(self._timeout) or [])
        for f, of in zip(futures[1:], overlaps):
            rows = f.get(self._timeout) or []
            k = len(of.get(self._timeout) or []) if of is not None else 0
            merged.extend(rows[k:])
        return merged

    def list_databases(self):
        return self._call_sync("meta", "list_databases")

    def list_tables(self):
        return self._call_sync("meta", "list_tables")

    def schema(self, table_name):
        return self._call_sync("meta", "schema %s" % table_name)

    def chgpasswd(self, password):
        self._call_sync("meta", "chgpasswd %s" % password)

    def reload_users(self):
        self._call_sync("meta", "reload_users")

    # ── user management: client-side sugar over _meta_.user, mirroring
    # the reference SDK's API (its create/delete/update_user are SQL on
    # the user table + reload_users; placeholders here, not string
    # concatenation) ──

    def create_user(self, username, password):
        if not (username and password):
            raise Error("Both username and password required")
        if self.execute("select * from _meta_.user where name=?",
                        [username]):
            raise Error("User already exist")
        import hashlib
        digest = hashlib.sha1(password.encode("utf-8")).hexdigest()
        self.execute("insert into _meta_.user values(?, ?, ?, ?)",
                     [username, digest, False, ""])
        self.reload_users()

    def delete_user(self, username):
        self.execute("delete from _meta_.user where name=?", [username])
        self.reload_users()

    def list_users(self):
        return self.execute("select * from _meta_.user")

    def update_user(self, username, perm=None, is_admin=None):
        """perm: a 'db1=write;db2.t=read' string, or a dict whose None
        values delete entries (reference client.py:144-167 semantics)."""
        rows = self.execute("select * from _meta_.user where name=?",
                            [username])
        if not rows:
            raise Error("User not exist")
        row = list(rows[0])
        if perm is not None:
            if isinstance(perm, str):
                row[-1] = perm
            elif isinstance(perm, dict):
                orig = dict(x for x in
                            (e.split("=") for e in (row[-1] or "").split(";"))
                            if len(x) == 2)
                for k, v in perm.items():
                    if v is None:
                        orig.pop(k, None)
                    elif v in ("write", "read"):
                        orig[k] = v
                    else:
                        raise Error("Invalid perm type: %s" % (v,))
                row[-1] = ";".join("%s=%s" % kv for kv in orig.items())
            else:
                raise Error("Invalid perm: %r" % (perm,))
        if is_admin is not None:
            row[-2] = is_admin
        self.execute("insert into _meta_.user values(?, ?, ?, ?)", row)
        self.reload_users()

    # ── wire internals ──

    def _call_sync(self, cmd, arg):
        return self._call(cmd, arg).get(self._timeout)

    def _call(self, cmd, sql_or_id, args=None, cache=False, chunk_rows=0):
        with self._plock:
            self._ticket += 1
            ticket = self._ticket
        fut = Future()
        self._pending[ticket] = fut
        doc = {"0": ticket, "1": cmd, "2": sql_or_id}
        if args is not None:
            doc["3"] = args
        if cache:
            doc["4"] = 1
        if chunk_rows > 0:
            doc["5"] = chunk_rows
        try:
            if self._protocol == "json":
                body = json.dumps(doc).encode("utf-8")
            else:
                body = _bson_encode(doc)
            self._write_frame(body)
        except Exception as e:
            # encode/send failure: unregister the orphaned ticket and
            # surface a client Error (e.g. an out-of-int64 argument)
            self._pending.pop(ticket, None)
            if isinstance(e, Error):
                raise
            raise Error("send failed: %s" % e)
        return fut

    def _write_frame(self, body):
        with self._wlock:
            self._sock.sendall(struct.pack("<i", len(body)) + body)

    def _read_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise Error("Connection closed")
            buf += chunk
        return buf

    def _read_loop(self):
        try:
            while True:
                (length,) = struct.unpack("<i", self._read_exact(4))
                body = self._read_exact(length) if length > 0 else b""
                if body == b"H":
                    self._write_frame(b"")  # heartbeat ack
                    continue
                if not body:
                    continue
                if self._protocol == "json":
                    doc = json.loads(body.decode("utf-8"))
                else:
                    doc = _bson_decode(body)
                ticket = doc.get("0", -1)
                if doc.get("2"):
                    # non-final chunk of a chunked SELECT: buffer rows,
                    # the ticket's future stays pending
                    rows = doc.get("1")
                    if isinstance(rows, list):
                        self._chunks.setdefault(ticket, []).extend(rows)
                    continue
                fut = self._pending.pop(ticket, None)
                # drop the ticket's chunk buffer UNCONDITIONALLY: a final
                # frame for a ticket whose future is already gone (timed
                # out / cancelled) must not strand its buffered rows
                buf = self._chunks.pop(ticket, None)
                if fut is not None:
                    res = doc.get("1")
                    if buf is not None and not isinstance(res, str):
                        # an error final frame voids the buffered prefix
                        res = buf + (res if isinstance(res, list) else [])
                    fut._complete(res)
        except Exception as e:  # noqa: BLE001 — fail all in-flight calls
            # partial chunk buffers die with the connection (mirrors the
            # Scala NetClient, which clears its partial map on loss)
            self._chunks.clear()
            if not self._closed:
                err = Error("Connection lost: %s" % e)
                for t in list(self._pending):
                    f = self._pending.pop(t, None)
                    if f is not None:
                        f._complete(err)
