"""Wire protocol: the six-sublanguage S-expression command surface.

The reference's listener reads one tagged S-expression per command and
dispatches on the envelope tag to a sublanguage module
(lib/listener.ml:17-28, lib/envelope.ml). This module provides the same
surface as a library: ``Server.execute("(dml (InsertTuple ...))")`` parses
the statement (same record-sexp spelling as the OCaml [@@deriving sexp]
encoders, verified against the reference's own parse tests), executes it
against the versioned Database, and returns the listener's response shape —
relations serialize at most 16 tuples with a truncated flag
(lib/listener.ml:64,111-123), and every successful mutation advances the
HEAD branch tip (lib/listener.ml:47-51).

Concurrency mirrors the reference's optimistic CAS loop
(lib/listener.ml:53-59): every response carries the db hash; a writer may
pin the ``base_hash`` it executed against, and a mutation whose base is
stale (another writer advanced the head in between) is rejected with
``errors.Conflict`` — nothing is applied. Commands are serialized by a
server lock (the analogue of the reference's atomic head cell); the CAS
check runs inside it.

``TcpFrontend`` is the socket transport (lib/transport.ml parity): one
thread per connection (the reference spawns one OCaml domain per
connection, lib/listener.ml:174-187), one S-expression per command, one
newline-terminated S-expression response.
"""

from __future__ import annotations

import os
import socket
import stat
import threading
from typing import Any

from pyspark.sql import SparkSession

from sakura_spark import errors
from sakura_spark.database import Database
from sakura_spark.drl import compile_query
from sakura_spark.drl import parser as drl_parser
from sakura_spark.drl.parser import ParseError, _atom_str, _build, _value, read_sexp
from sakura_spark.icl import ast as icl_ast
from sakura_spark.management.branches import BranchManager
from sakura_spark.management.merge import PREFER_LEFT, PREFER_RIGHT, REVERT_TO_ANCESTOR
from sakura_spark.scl import DEFAULT_BATCH, SessionRegistry

RESULT_LIMIT = 16  # lib/listener.ml:64


def _fields(items: list, start: int = 1) -> dict[str, Any]:
    """Record-sexp fields: (Tag (field1 v1) (field2 v2) ...) -> dict."""
    out = {}
    for it in items[start:]:
        if not (isinstance(it, list) and len(it) >= 1 and isinstance(it[0], str)):
            raise ParseError(f"expected (field value), got {it!r}")
        out[_atom_str(it[0])] = it[1] if len(it) == 2 else it[1:]
    return out


def _attr_values(x) -> dict:
    """((name (Str "Alice")) (age (Int 30))) -> {"name": "Alice", "age": 30}"""
    return {_atom_str(p[0]): _value(p[1]) for p in x}


# --- ICL wire AST -> icl.ast (And/Or are n-ary lists in the wire form) ------


def _binding(x) -> icl_ast.Binding:
    if isinstance(x, list) and len(x) == 2 and x[0] == "Var":
        return icl_ast.Var(_atom_str(x[1]))
    if isinstance(x, list) and len(x) == 2 and x[0] == "Const":
        return icl_ast.ConstVal(_value(x[1]))
    raise ParseError(f"bad binding expr: {x!r}")


def parse_constraint_body(x) -> icl_ast.Body:
    tag = x[0]
    if tag == "MemberOf":
        f = _fields(x)
        return icl_ast.MemberOf(
            _atom_str(f["target"]),
            tuple((_atom_str(p[0]), _binding(p[1])) for p in f["binding"]),
        )
    if tag == "Not":
        f = _fields(x)
        # The wire form carries a universe relation; violations-compilation
        # makes the closed world implicit (SURVEY §2.4).
        return icl_ast.Not(parse_constraint_body(f["body"]))
    if tag in ("And", "Or"):
        parts = [parse_constraint_body(p) for p in x[1]]
        if not parts:
            raise ParseError(f"empty {tag}")
        cls = icl_ast.And if tag == "And" else icl_ast.Or
        out = parts[0]
        for p in parts[1:]:
            out = cls(out, p)
        return out
    if tag in ("Exists", "Forall"):
        f = _fields(x)
        cls = icl_ast.Exists if tag == "Exists" else icl_ast.Forall
        return cls(
            _atom_str(f["variable"]), _atom_str(f["quantifier"]), parse_constraint_body(f["body"])
        )
    raise ParseError(f"unknown constraint body: {tag!r}")


_STRATEGIES = {
    "PreferLeft": PREFER_LEFT,
    "PreferRight": PREFER_RIGHT,
    "RevertToAncestor": REVERT_TO_ANCESTOR,
}


def _sexp_atom(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "()"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return str(v)


def error_sexp(e: Exception) -> str:
    """Render an exception as the reference listener's error response:
    ``((error (<kebab-variant> (field value) ...)))`` — variant atoms and
    field spellings exactly per lib/error.ml:17-33 (relation-not-found,
    relation-already-exists, tuple-not-found, duplicate-tuple,
    constraint-violation, unrecognized-sublanguage, malformed-expression,
    syntax-error, conflict, sublanguage-error). Non-Sakura exceptions
    (Py4J, bugs) keep the InternalError extension — the reference's OCaml
    type system has no analogue of an escaping runtime exception."""

    def atom(v) -> str:
        # sexplib quotes an Atom only when it must (whitespace, parens,
        # quotes, empty); simple symbols — tags, hashes, relation names —
        # render bare, exactly as the reference's serialized errors do.
        s = str(v)
        if s and not any(c in s for c in ' \t\n\r()";|'):
            return s
        return _sexp_atom(s)

    def render(tag: str, *fields: tuple[str, object]) -> str:
        payload = "".join(f" ({k} {atom(v)})" for k, v in fields)
        return f"((error ({tag}{payload})))"

    if isinstance(e, errors.UnknownRelation):
        return render("relation-not-found", ("relation", str(e)))
    if isinstance(e, errors.RelationExists):
        return render("relation-already-exists", ("relation", str(e)))
    if isinstance(e, errors.UnknownTuple):
        return render("tuple-not-found", ("hash", str(e)))
    if isinstance(e, errors.DuplicateTuple):
        return render("duplicate-tuple", ("hash", str(e)))
    if isinstance(e, errors.ConstraintViolation):
        return render("constraint-violation", ("message", str(e)))
    if isinstance(e, errors.UnrecognizedSublanguage):
        return render("unrecognized-sublanguage", ("tag", str(e)))
    if isinstance(e, errors.MalformedExpression):
        return render("malformed-expression", ("expression", str(e)))
    if isinstance(e, errors.Conflict):
        return render(
            "conflict",
            ("old-hash", e.expected or "--"),
            ("new-hash", e.actual or "--"),
        )
    if isinstance(e, ParseError):
        return render("syntax-error", ("message", str(e)))
    if isinstance(e, errors.SakuraError):
        # Any other engine diagnostic wraps like the reference's
        # SublanguageError catch-all (lib/error.ml:31).
        return render("sublanguage-error", ("error", str(e)))
    return render("InternalError", ("message", f"{type(e).__name__}: {e}"))


def render_sexp(value) -> str:
    """Render a response value as an S-expression (dicts as (key value)
    pairs, lists as proper lists) — the wire output format."""
    if isinstance(value, dict):
        return "(" + " ".join(f"({k} {render_sexp(v)})" for k, v in value.items()) + ")"
    if isinstance(value, (list, tuple)):
        return "(" + " ".join(render_sexp(v) for v in value) + ")"
    return _sexp_atom(value)


class Server:
    """The engine assembled the way lib/system.ml wires the reference:
    database + branch registry + cursor sessions behind one dispatcher."""

    def __init__(
        self,
        spark: SparkSession,
        name: str = "db",
        store=None,
        snapshot_on_mutation: bool = True,
    ):
        self.spark = spark
        self.db = Database(spark, name, store=store, snapshot_on_mutation=snapshot_on_mutation)
        self.branches = BranchManager(self.db.store)
        self.sessions = SessionRegistry()
        self.result_limit = RESULT_LIMIT
        # The analogue of the reference's `Atomic.make db` head cell
        # (lib/listener.ml:181): commands serialize on this lock and the
        # CAS base-hash check runs inside it.
        self._lock = threading.RLock()

    # --- public API --------------------------------------------------------

    # DCL statements that mutate server state (the rest are reads).
    _MUTATING_DCL = {"CreateBranch", "Checkout", "UpdateBranchTip", "Merge"}

    def _is_mutation(self, tag: str, stmt) -> bool:
        if tag in ("ddl", "dml", "icl"):
            return True
        if tag == "dcl":
            s = stmt[0] if isinstance(stmt, list) else stmt
            return s in self._MUTATING_DCL
        return False

    def execute(self, text: str, base_hash: str | None = None) -> dict:
        """One wire command: '(tag statement)'.

        ``base_hash`` is the optimistic-concurrency pin: the db hash this
        writer last observed (returned in every response). If another
        writer advanced the head since, a mutation fails with
        ``errors.Conflict`` BEFORE anything is applied — the
        compare-and-set of lib/listener.ml:53-59. Readers and un-pinned
        writers (base_hash=None, last-writer-wins) are unaffected.

        Remote writers express the pin in-band with the ``(cas <hash>
        (tag statement))`` envelope. The reference's listener runs the
        same compare-and-set server-side on its atomic head cell
        (lib/listener.ml:56: each connection's domain races on the head);
        our server lock removes that race, so the envelope carries the
        head the CLIENT observed instead — same contract, same Conflict
        response, same retry-by-re-reading-the-head loop.
        """
        sexp = read_sexp(text)
        if isinstance(sexp, list) and len(sexp) == 3 and sexp[0] == "cas":
            base_hash = _atom_str(sexp[1])
            sexp = sexp[2]
        if not (isinstance(sexp, list) and len(sexp) == 2 and isinstance(sexp[0], str)):
            raise errors.MalformedExpression(text.strip())  # lib/listener.ml:44-45
        tag, stmt = sexp
        handler = getattr(self, f"_exec_{tag}", None)
        if handler is None:
            # lib/listener.ml:33-34 — UnrecognizedSublanguage carries the tag.
            raise errors.UnrecognizedSublanguage(tag)
        with self._lock:
            if (
                base_hash is not None
                and self._is_mutation(tag, stmt)
                and self.db.hash is not None
                and base_hash != self.db.hash
            ):
                raise errors.Conflict(expected=base_hash, actual=self.db.hash)
            result = handler(stmt)
            self._advance_head()
        return result

    # --- DRL ---------------------------------------------------------------

    def _branch_name(self) -> str:
        """HEAD branch name or "--" (lib/listener.ml get_branch)."""
        try:
            return self.branches.get_head()
        except errors.UnknownBranch:
            return "--"

    def _relation_response(self, df, name: str = "derived") -> dict:
        """Query response, field-for-field the reference's serialize shape
        (lib/listener.ml:111-123): name, schema, rows, row_count,
        truncated, db_hash, db_name, branch."""
        rows = df.limit(self.result_limit + 1).collect()
        truncated = len(rows) > self.result_limit
        kept = rows[: self.result_limit]
        return {
            "relation": name,
            "schema": df.columns,
            "rows": [list(r) for r in kept],
            "row_count": len(kept),
            "truncated": truncated,
            "db_hash": self.db.hash,
            "db_name": self.db.name,
            "branch": self._branch_name(),
        }

    def _exec_drl(self, stmt) -> dict:
        q = _build(stmt)
        df = compile_query(self.spark, q, self.db.resolver, gate=True)
        return self._relation_response(df)

    # --- DDL ---------------------------------------------------------------

    def _exec_ddl(self, stmt) -> dict:
        tag = stmt[0]
        if tag == "CreateDatabase":
            # One database per server in this assembly; recreate = reset.
            self.db = Database(
                self.spark, _atom_str(stmt[1]), store=self.db.store,
                snapshot_on_mutation=self.db.snapshot_on_mutation,
            )
            return self._ok()
        if tag == "CreateRelation":
            f = _fields(stmt)
            schema = [(_atom_str(p[0]), _atom_str(p[1])) for p in f["schema"]]
            self.db.create_relation(_atom_str(f["name"]), schema)
            return self._ok()
        if tag == "RetractRelation":
            self.db.retract_relation(_atom_str(stmt[1]))
            return self._ok()
        if tag == "ClearRelation":
            self.db.clear_relation(_atom_str(stmt[1]))
            return self._ok()
        if tag == "RegisterDomain":
            from sakura_spark.domains import Domain
            from pyspark.sql import types as T

            f = _fields(stmt)
            card = f["cardinality"]
            card_name = card if isinstance(card, str) else card[0]
            # Opaque user domains accept any value (shallow checking,
            # lib/manipulation.ml:20-33); stored as strings.
            self.db.register_domain(
                Domain(_atom_str(f["name"]), T.StringType(), cardinality=card_name.lower())
            )
            return self._ok()
        raise ParseError(f"unknown ddl statement: {tag!r}")

    # --- DML ---------------------------------------------------------------

    def _exec_dml(self, stmt) -> dict:
        tag = stmt[0]
        if tag == "InsertTuple":
            f = _fields(stmt)
            self.db.insert_tuples(_atom_str(f["relation"]), [_attr_values(f["attributes"])])
            return self._ok()
        if tag == "InsertTuples":
            f = _fields(stmt)
            rows = [_attr_values(t) for t in f["tuples"]]
            self.db.insert_tuples(_atom_str(f["relation"]), rows)
            return self._ok()
        if tag == "DeleteTuple":
            f = _fields(stmt)
            self.db.delete_tuples(_atom_str(f["relation"]), [_attr_values(f["attributes"])])
            return self._ok()
        if tag == "Assign":
            f = _fields(stmt)
            df = compile_query(self.spark, _build(f["body"]), self.db.resolver)
            self.db.assign(_atom_str(f["target"]), df)
            return self._ok()
        if tag == "InsertFrom":
            f = _fields(stmt)
            df = compile_query(self.spark, _build(f["source"]), self.db.resolver)
            self.db.insert_from(_atom_str(f["target"]), df)
            return self._ok()
        if tag == "DeleteWhere":
            f = _fields(stmt)
            df = compile_query(self.spark, _build(f["predicate"]), self.db.resolver)
            self.db.delete_where(_atom_str(f["target"]), df)
            return self._ok()
        raise ParseError(f"unknown dml statement: {tag!r}")

    # --- ICL ---------------------------------------------------------------

    def _exec_icl(self, stmt) -> dict:
        if stmt[0] != "RegisterConstraint":
            raise ParseError(f"unknown icl statement: {stmt[0]!r}")
        f = _fields(stmt)
        self.db.register_constraint(
            _atom_str(f["constraint_name"]),
            _atom_str(f["relation_name"]),
            parse_constraint_body(f["body"]),
        )
        return self._ok()

    # --- DCL ---------------------------------------------------------------

    def _exec_dcl(self, stmt) -> dict:
        tag = stmt[0]
        if tag == "CreateBranch":
            f = _fields(stmt)
            h = _atom_str(f["hash"]) if "hash" in f else self.db.hash or self.db.commit()
            self.branches.create_branch(_atom_str(f["name"]), h)
            return self._ok()
        if tag == "Checkout":
            self.db = self.branches.checkout(self.spark, _atom_str(stmt[1]))
            return self._ok()
        if tag == "GetHead":
            return {"head": self.branches.get_head(), "db_hash": self.db.hash}
        if tag == "GetBranchTip":
            return {"tip": self.branches.get_branch_tip(_atom_str(stmt[1]))}
        if tag == "UpdateBranchTip":
            f = _fields(stmt)
            self.branches.update_branch_tip(_atom_str(f["name"]), _atom_str(f["hash"]))
            return self._ok()
        if tag == "Merge":
            f = _fields(stmt)
            strategy = _STRATEGIES[
                f["strategy"] if isinstance(f["strategy"], str) else f["strategy"][0]
            ]
            merged, conflicts = self.branches.merge(
                self.spark, _atom_str(f["left"]), _atom_str(f["right"]), strategy
            )
            if self.branches.get_head() == _atom_str(f["left"]):
                self.db = merged
            return {"conflicts": conflicts, "db_hash": merged.hash}
        raise ParseError(f"unknown dcl statement: {tag!r}")

    # --- SCL ---------------------------------------------------------------

    def _exec_scl(self, stmt) -> dict:
        tag = stmt[0]
        if tag == "Begin":
            f = _fields(stmt)
            q = _build(f["query"])
            limit = int(_atom_str(f["limit"])) if "limit" in f else DEFAULT_BATCH
            df = compile_query(self.spark, q, self.db.resolver)
            cid, batch = self.sessions.begin(
                df, query=str(f["query"]), db_hash=self.db.hash, limit=limit
            )
            return self._cursor_response(cid, batch, schema=df.columns)
        if tag == "Fetch":
            f = _fields(stmt)
            limit = int(_atom_str(f["limit"])) if "limit" in f else DEFAULT_BATCH
            cid = _atom_str(f["cursor"])
            batch = self.sessions.fetch(cid, limit)
            return self._cursor_response(cid, batch)
        if tag == "Close":
            f = _fields(stmt)
            self.sessions.close(_atom_str(f["cursor"]))
            return self._ok()
        raise ParseError(f"unknown scl statement: {tag!r}")

    # --- internals ---------------------------------------------------------

    def _ok(self) -> dict:
        """Transition response (lib/listener.ml serialize Ok Transition):
        ok + db_hash + db_name + branch."""
        return {
            "ok": True,
            "db_hash": self.db.hash,
            "db_name": self.db.name,
            "branch": self._branch_name(),
        }

    def _cursor_response(self, cid: str, batch, schema: list[str] | None = None) -> dict:
        """Cursor response (lib/listener.ml serialize Ok Cursor): id, rows,
        row_count, has_more, db_hash, db_name, branch (+ schema on Begin)."""
        out = {
            "cursor": cid,
            "rows": [list(r) for r in batch],
            "row_count": len(batch),
            "has_more": cid in self.sessions.open_cursors(),
            "db_hash": self.db.hash,
            "db_name": self.db.name,
            "branch": self._branch_name(),
        }
        if schema is not None:
            out["schema"] = schema
        return out

    def execute_sexp(self, text: str, base_hash: str | None = None) -> str:
        """Full listener parity: execute and render the response as an
        S-expression string (lib/listener.ml:111-123 shape); errors render
        with the reference's kebab-case variant atoms and (field value)
        payloads (lib/error.ml:17-33) via :func:`error_sexp`."""
        try:
            return render_sexp(self.execute(text, base_hash=base_hash))
        except Exception as e:  # noqa: BLE001 — listener parity: EVERY
            # failure serializes as a response (lib/listener.ml renders all
            # exceptions); letting a Py4J/AnalysisException escape would
            # kill the connection thread and leave the client hanging.
            return error_sexp(e)

    def _advance_head(self) -> None:
        """HEAD branch tip follows the database head (lib/listener.ml:47-51)."""
        try:
            head = self.branches.get_head()
        except errors.UnknownBranch:
            return
        if self.db.hash and self.branches.get_branch_tip(head) != self.db.hash:
            try:
                self.branches.update_branch_tip(head, self.db.hash)
            except errors.UnknownBranch:
                pass


# --- TCP transport (lib/transport.ml / lib/listener.ml:174-187 parity) ------


def _split_complete_sexp(buf: str) -> tuple[str | None, str]:
    """Return (first complete S-expression, remainder) or (None, buf) if the
    buffer does not yet hold a balanced expression. Paren depth is tracked
    outside double-quoted strings (with backslash escapes) — the streaming
    framing the reference gets from Sexplib.Sexp.input_sexp."""
    depth = 0
    in_str = False
    esc = False
    started = False
    for i, ch in enumerate(buf):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            started = True
        elif ch == "(":
            depth += 1
            started = True
        elif ch == ")":
            depth -= 1
            if depth == 0 and started:
                return buf[: i + 1], buf[i + 1 :]
            if depth < 0:
                raise ParseError("unbalanced ')' in stream")
    return None, buf


class TcpFrontend:
    """Thin socket listener around :class:`Server` (lib/transport.ml:14-74 +
    lib/listener.ml:174-187): accept loop in one thread, one handler thread
    per connection (the reference spawns one OCaml domain each), one
    S-expression in, one newline-terminated S-expression response out
    (lib/listener.ml's output_response appends the newline). All command
    execution funnels through ``Server.execute`` so the CAS/lock semantics
    are identical to in-process use.

    Like the reference's transport (lib/transport.ml:23-29, parse at
    :31-50), the listener binds either an INET ``(address, port)`` pair or
    an AF_UNIX socket ``path`` — supplying both is a configuration error
    (transport.ml:38 rejects the mix with the same message)."""

    def __init__(
        self,
        server: Server,
        host: str | None = None,
        port: int | None = None,
        path: str | None = None,
    ):
        self.server = server
        if path is not None:
            if host is not None or port is not None:
                # lib/transport.ml:38
                raise ValueError("transport/tcp: use (address + port) or (path), not both")
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            # A crashed prior run leaves its socket file behind (unlink
            # only runs on clean stop), and bind would fail EADDRINUSE with
            # no listener alive. Standard unix-listener practice: remove a
            # stale path first — but only if it actually is a socket, so a
            # mistyped path never deletes a regular file.
            try:
                if stat.S_ISSOCK(os.stat(path).st_mode):
                    os.unlink(path)
            except FileNotFoundError:
                pass
            self._sock.bind(path)
            self.host: str | None = None
            self.port: int | None = None
            self.path: str | None = path
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind((host or "127.0.0.1", port or 0))
            self.host, self.port = self._sock.getsockname()
            self.path = None
        self._sock.listen(5)  # lib/transport.ml:66
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._accept_thread: threading.Thread | None = None

    def start(self) -> "TcpFrontend":
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        if self.path is not None:
            try:
                os.unlink(self.path)
            except OSError:
                pass
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5)
        for t in self._threads:
            t.join(timeout=5)

    def __enter__(self) -> "TcpFrontend":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return  # socket closed by stop()
            t = threading.Thread(target=self._handle_client, args=(conn,), daemon=True)
            t.start()
            # Prune finished handlers so a long-lived server's thread list
            # stays O(live connections), not O(all connections ever).
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _handle_client(self, conn: socket.socket) -> None:
        import codecs

        # Incremental decoder: a multi-byte UTF-8 sequence split across
        # recv() boundaries must not be mangled by per-chunk decoding.
        decoder = codecs.getincrementaldecoder("utf-8")(errors="replace")
        buf = ""
        try:
            while not self._stop.is_set():
                try:
                    data = conn.recv(65536)
                except OSError:
                    return
                if not data:
                    return  # End_of_file -> connection done (lib/listener.ml:169)
                buf += decoder.decode(data)
                while True:
                    try:
                        cmd, buf = _split_complete_sexp(buf)
                    except ParseError as e:
                        conn.sendall((error_sexp(e) + "\n").encode())
                        buf = ""
                        break
                    if cmd is None:
                        break
                    resp = self.server.execute_sexp(cmd)
                    conn.sendall((resp + "\n").encode())
        finally:
            try:
                conn.close()
            except OSError:
                pass
