"""TCP line-protocol server — the reference's last uncovered surface.

Reproduces the 4-verb tab-separated protocol (lib/blurrily/server.rb:19-47,
command_processor.rb:12-51) over :class:`IndexGroup`:

    PUT\t<db>\t<needle>\t<ref>[\t<weight>]   → OK
    FIND\t<db>\t<needle>[\t<limit>]          → OK[\t<ref>\t<matches>\t<weight>...]
    DELETE\t<db>\t<ref>                      → OK
    CLEAR\t<db>                              → OK
    anything else                            → ERROR\t<message>

Error taxonomy and argument validation mirror command_processor.rb
(golden strings from command_processor_spec.rb are pytest fixtures).

Single PUTs buffer in memory per db (first-put-wins within the buffer) and
merge into the live LocalFinder arrays INCREMENTALLY on the next read
(numpy appends + one re-sort — the serving analogue of the reference's
O(1) in-place put, storage.c:398-473, so a mixed PUT/FIND workload like
bin/bench:107-118's stress op stays in the ms regime). Durability is
decoupled: buffered rows flush to the IndexGroup as ONE delta segment on
the cadence of server.rb:24-27 — a background timer every
``save_interval`` seconds, SIGUSR1, and shutdown.
"""

from __future__ import annotations

import re
import socket
import socketserver
import threading

from blurrily_ray.namespaces import IndexGroup

REF_RANGE = range(1, 2**31 + 1)      # defaults.rb:8
WEIGHT_RANGE = range(0, 2**31 + 1)   # defaults.rb:9
LIMIT_RANGE = range(1, 1025)         # defaults.rb:7
_DB_RE = re.compile(r"^[a-z_]+$")
_NUM_RE = re.compile(r"^\d+$")


class ProtocolError(Exception):
    pass


class CommandProcessor:
    """Stateful protocol interpreter over an IndexGroup (one per server).

    Commands apply in arrival order, like the reference's single-threaded
    event loop (server.rb:19-31) — the server serializes calls."""

    COMMANDS = ("FIND", "PUT", "DELETE", "CLEAR")
    # max positional args per verb after the db name (Ruby raises
    # ArgumentError 'wrong number of arguments' past the method arity)
    _ARITY = {"PUT": (2, 3), "FIND": (1, 2), "DELETE": (1, 1),
              "CLEAR": (0, 0)}

    def __init__(self, group: IndexGroup):
        self.group = group
        self._buf: dict[str, list] = {}          # rows pending DURABILITY
        self._buffered_refs: dict[str, set] = {}
        self._pending: dict[str, list] = {}      # rows pending finder MERGE
        self._finders: dict = {}  # db → LocalFinder (serving kernel)
        self._lock = threading.Lock()

    # ------------------------------------------------------------ protocol

    def process_command(self, line: str) -> str:
        parts = line.split("\t")
        command, map_name, args = parts[0], \
            parts[1] if len(parts) > 1 else "", parts[2:]
        try:
            if command not in self.COMMANDS:
                raise ProtocolError("Unknown command")
            if not _DB_RE.match(map_name or ""):
                raise ProtocolError("Invalid database name")
            lo, hi = self._ARITY[command]
            if not (lo <= len(args) <= hi):
                raise ProtocolError(
                    f"wrong number of arguments ({len(args)} for {lo}..{hi})")
            with self._lock:
                result = getattr(self, f"on_{command}")(map_name, *args)
            out = ["OK"]
            if result:
                out.extend(str(x) for x in result)
            return "\t".join(out)
        except ProtocolError as e:
            return f"ERROR\t{e}"

    def on_PUT(self, map_name, needle, ref, weight=None):
        if not (_NUM_RE.match(ref) and int(ref) in REF_RANGE):
            raise ProtocolError("Invalid reference")
        if weight is not None and not (_NUM_RE.match(weight)
                                       and int(weight) in WEIGHT_RANGE):
            raise ProtocolError("Invalid weight")
        refs = self._buffered_refs.setdefault(map_name, set())
        if int(ref) not in refs:  # first-put-wins inside the buffer
            refs.add(int(ref))
            row = {"ref": int(ref), "text": needle,
                   "weight": int(weight) if weight else 0}
            self._buf.setdefault(map_name, []).append(row)
            self._pending.setdefault(map_name, []).append(row)
        return None

    def on_DELETE(self, map_name, ref):
        if not (_NUM_RE.match(ref) and int(ref) in REF_RANGE):
            raise ProtocolError("Invalid reference")
        # bring the live finder up to date BEFORE the delete so the
        # buffered-put-then-delete ordering matches the durable replay;
        # pending rows are consumed UNCONDITIONALLY — they are covered by
        # _buf/flush below, and leaving them behind when no finder exists
        # would resurrect deleted refs on any future finder build that
        # doesn't also pop them
        finder = self._finders.get(map_name)
        pending = self._pending.pop(map_name, None) or []
        if finder is not None:
            finder.put_rows(pending)
        self._flush_locked(map_name)
        self.group.delete(map_name, [int(ref)])
        if finder is not None:
            finder.delete_refs([int(ref)])
        return None

    def on_FIND(self, map_name, needle, limit=None):
        if limit is not None and not (_NUM_RE.match(limit)
                                      and int(limit) in LIMIT_RANGE):
            raise ProtocolError("Limit must be a number")
        # serve from the in-memory inverted index (reference latency
        # regime). Buffered PUTs merge into the LIVE arrays incrementally
        # (LocalFinder.put_rows — numpy appends + one re-sort, ms not
        # seconds); the Ray-job flush to delta segments happens only on
        # the durability timer / SIGUSR1 / shutdown, exactly like the
        # reference's periodic save (server.rb:24-27).
        finder = self._finders.get(map_name)
        if finder is None:
            from blurrily_ray.stages.index import LocalFinder

            # Ray-free load: parquet segments → live arrays directly
            # (namespaces.local_finder) — query-ready in ms, no Ray job
            finder = self.group.local_finder(map_name)
            buffered = self._buf.get(map_name) or []
            if finder is None:
                if not buffered:
                    return []
                finder = LocalFinder()
            self._finders[map_name] = finder
            # a fresh build reflects the GROUP; everything still buffered
            # (flushed or not, _buf holds exactly the unflushed rows)
            # merges on top — pending is subsumed by _buf here
            self._pending.pop(map_name, None)
            finder.put_rows(buffered)
        else:
            finder.put_rows(self._pending.pop(map_name, None) or [])
        triples = finder.find(needle, int(limit) if limit else 10)
        return [x for t in triples for x in t]

    def on_CLEAR(self, map_name):
        self._buf.pop(map_name, None)
        self._buffered_refs.pop(map_name, None)
        self._pending.pop(map_name, None)
        self._finders.pop(map_name, None)
        self.group.clear(map_name)
        return None

    # ------------------------------------------------------------- flush

    def _flush_locked(self, map_name: str) -> None:
        rows = self._buf.pop(map_name, None)
        self._buffered_refs.pop(map_name, None)
        if not rows:
            return
        import ray.data

        self.group.put_bulk(map_name, ray.data.from_items(rows),
                            ref_col="ref", text_col="text",
                            weight_col="weight")
        # the live finder stays valid: rows it hasn't merged yet remain in
        # _pending and merge on the next FIND; put_bulk's first-put-wins
        # anti-join guarantees the durable state equals the served state

    def flush_all(self) -> None:
        """Durability point: buffered puts become delta segments (the
        reference's periodic save, server.rb:24-27)."""
        with self._lock:
            for name in list(self._buf):
                self._flush_locked(name)


class BlurrilyServer:
    """Threaded TCP server speaking the line protocol; commands serialize
    through the CommandProcessor lock. Periodic flush every
    ``save_interval`` seconds + flush on SIGUSR1 + flush on shutdown."""

    def __init__(self, directory: str, host: str = "127.0.0.1",
                 port: int = 12021, save_interval: float = 60.0):
        self.processor = CommandProcessor(IndexGroup(directory))
        self.host, self.port = host, port
        self.save_interval = save_interval
        self._stop = threading.Event()
        processor = self.processor

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    raw = self.rfile.readline()
                    if not raw:
                        break  # connection stays open until client closes
                    line = raw.decode("utf-8", "replace").rstrip("\r\n")
                    if not line:
                        continue
                    reply = processor.process_command(line)
                    self.wfile.write(reply.encode() + b"\n")

        self._tcp = socketserver.ThreadingTCPServer(
            (host, port), Handler, bind_and_activate=False)
        self._tcp.allow_reuse_address = True
        self._tcp.daemon_threads = True

    def start(self) -> None:
        self._tcp.server_bind()
        self._tcp.server_activate()
        self.port = self._tcp.server_address[1]
        threading.Thread(target=self._tcp.serve_forever, daemon=True).start()
        threading.Thread(target=self._save_loop, daemon=True).start()
        try:  # SIGUSR1 → save now (server.rb:27); main thread only
            import signal

            signal.signal(signal.SIGUSR1,
                          lambda *_: self.processor.flush_all())
        except (ValueError, OSError):
            pass

    def _save_loop(self) -> None:
        while not self._stop.wait(self.save_interval):
            self.processor.flush_all()

    def stop(self) -> None:
        self._stop.set()
        self._tcp.shutdown()
        self._tcp.server_close()
        self.processor.flush_all()  # save-on-shutdown (server.rb:25)


class Client:
    """Minimal blocking client (client.rb:52-133): one socket, one
    request/response per command."""

    def __init__(self, host: str = "127.0.0.1", port: int = 12021):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("rb")

    def request(self, *parts) -> str:
        self.sock.sendall(("\t".join(str(p) for p in parts) + "\n").encode())
        return self.rfile.readline().decode().rstrip("\n")

    def find(self, db: str, needle: str, limit: int | None = None):
        args = [db, needle] + ([limit] if limit else [])
        reply = self.request("FIND", *args)
        if not reply.startswith("OK"):
            raise RuntimeError(reply)
        vals = [int(x) for x in reply.split("\t")[1:]]
        return [vals[i:i + 3] for i in range(0, len(vals), 3)]

    def put(self, db: str, needle: str, ref: int, weight: int | None = None):
        args = [db, needle, ref] + ([weight] if weight is not None else [])
        reply = self.request("PUT", *args)
        if not reply.startswith("OK"):
            raise RuntimeError(reply)

    def close(self):
        self.sock.close()


def main(argv=None):  # pragma: no cover - thin CLI shim
    import argparse

    ap = argparse.ArgumentParser(description="blurrily_ray wire server")
    ap.add_argument("-p", "--port", type=int, default=12021)
    ap.add_argument("-b", "--bind", default="127.0.0.1")
    ap.add_argument("-d", "--directory", default=".")
    ap.add_argument("--save-interval", type=float, default=60.0)
    args = ap.parse_args(argv)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    srv = BlurrilyServer(args.directory, args.bind, args.port,
                         args.save_interval)
    srv.start()
    print(f"listening on {args.bind}:{srv.port}")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
