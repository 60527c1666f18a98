"""TCP front end: per-connection sessions over a shared catalog.

Mirrors the reference's client/server contract (server.c:795-871 eval
loop; per-session env server.c:72-78; per-op error replies :856-859):
variable bindings are connection-private, the column store is shared,
an error leaves the session usable, and concurrent clients compose.
"""

import threading

import pytest

from kstore_spark.server import KstoreClient, KstoreServer


@pytest.fixture()
def server(spark, tmp_path):
    with KstoreServer(spark, str(tmp_path / "db")) as srv:
        yield srv


def _client(server):
    return KstoreClient(server.host, server.port)


def test_end_to_end_query(server):
    with _client(server) as c:
        assert c.query('create(na,"unsorted")') == ""
        assert c.query("insert(na,1)") == ""
        assert c.query("insert(na,2)") == ""
        assert c.query("s=select(na)") == ""
        assert c.query("f=fetch(na,s)") == ""
        assert c.query("a=avg(f)") == ""
        assert c.query("print(a)") == "1"  # C truncating avg
        assert c.query("print(f)") == "1\n2"


def test_sessions_are_connection_private(server):
    """Same variable name bound to different results in two concurrent
    connections — neither clobbers the other (reference: one env per
    session struct)."""
    with _client(server) as c1, _client(server) as c2:
        c1.query('create(pa,"unsorted")')
        c1.query("insert(pa,10)")
        c1.query("insert(pa,20)")
        c1.query("v=select(pa,10)")        # c1's v -> position of 10
        c2.query("v=select(pa,20)")        # c2's v -> position of 20
        f1 = c1.query("f=fetch(pa,v)") or c1.query("print(f)")
        f2 = c2.query("f=fetch(pa,v)") or c2.query("print(f)")
        assert f1 == "10"
        assert f2 == "20"


def test_error_keeps_session_alive(server):
    with _client(server) as c:
        with pytest.raises(RuntimeError):
            c.query("f=fetch(nosuchcol,v)")
        with pytest.raises(RuntimeError):
            c.query("not a query at all(")
        # session still usable, bindings intact
        c.query('create(ea,"unsorted")')
        c.query("insert(ea,7)")
        c.query("s=select(ea)")
        c.query("f=fetch(ea,s)")
        assert c.query("print(f)") == "7"


def test_concurrent_clients_compose(server):
    """Two threads, separate connections, separate columns — every row
    durable (the catalog flock serializes metadata; the pool runs both
    sessions concurrently)."""
    errs = []

    def burst(col, base):
        try:
            with _client(server) as c:
                c.query(f'create({col},"unsorted")')
                for i in range(4):
                    c.query(f"insert({col},{base + i})")
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    th1 = threading.Thread(target=burst, args=("ca", 100))
    th2 = threading.Thread(target=burst, args=("cb", 200))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs
    with _client(server) as c:
        c.query("s=select(ca)")
        c.query("f=fetch(ca,s)")
        assert c.query("print(f)") == "100\n101\n102\n103"
        c.query("s=select(cb)")
        c.query("f=fetch(cb,s)")
        assert c.query("print(f)") == "200\n201\n202\n203"


def test_load_over_socket(spark, tmp_path):
    """The reference ships the CSV over the wire (RPC_FILE,
    client.c:195-201); here load() resolves server-side against the
    server's load_dir — the cluster-appropriate equivalent (data comes
    from shared storage, not the client socket)."""
    with open(tmp_path / "t.csv", "w") as f:
        f.write("la,lb\n1,10\n2,20\n3,30\n")
    with KstoreServer(spark, str(tmp_path / "db"),
                      load_dir=str(tmp_path)) as srv:
        with KstoreClient(srv.host, srv.port) as c:
            c.query('create(la,"unsorted")')
            c.query('create(lb,"unsorted")')
            c.query('load("t.csv")')
            c.query("s=select(la,2,3)")
            c.query("f=fetch(lb,s)")
            assert c.query("print(f)") == "20\n30"


def test_mutations_visible_across_connections(server):
    """A second connection opened after a mutation sees it (shared
    storage, like the reference's shared struct storage)."""
    with _client(server) as c1:
        c1.query('create(ma,"unsorted")')
        c1.query("insert(ma,5)")
    with _client(server) as c2:
        c2.query("s=select(ma)")
        c2.query("f=fetch(ma,s)")
        assert c2.query("print(f)") == "5"
