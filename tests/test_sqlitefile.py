"""SQLite source (sources/sqlitefile.py): page/record walk against
databases written by the format's REFERENCE IMPLEMENTATION (stdlib
sqlite3) — the strongest differential in the repo: no builder twin,
every fixture byte comes from SQLite itself."""

from __future__ import annotations

import random
import sqlite3

import pytest

import distributed_computing_projects_spark.sources.sqlitefile as SQ
from distributed_computing_projects_spark.sources.sqlitefile import (
    iter_table_rows,
    list_tables,
    parse_create_table,
    read_sqlite,
)


def _db_bytes(tmp_path, setup, name="t.db"):
    p = tmp_path / name
    con = sqlite3.connect(p)
    try:
        setup(con)
        con.commit()
    finally:
        con.close()
    return p.read_bytes()


def _rows(data, table):
    return list(iter_table_rows(data, table))


def test_scalar_kinds_roundtrip(tmp_path):
    def setup(con):
        con.execute("CREATE TABLE t (i INTEGER, f REAL, s TEXT, "
                    "b BLOB, nil TEXT)")
        con.execute("INSERT INTO t VALUES (?,?,?,?,?)",
                    (-(1 << 40), 2.5, "héllo wörld", b"\x00\x01\xff",
                     None))
        con.execute("INSERT INTO t VALUES (0, 1.0, '', x'', NULL)")
    data = _db_bytes(tmp_path, setup)
    got = _rows(data, "t")
    assert got == [
        {"i": -(1 << 40), "f": 2.5, "s": "héllo wörld",
         "b": b"\x00\x01\xff", "nil": None},
        {"i": 0, "f": 1.0, "s": "", "b": b"", "nil": None},
    ]


def test_truncated_integer_body_drops_not_shrinks():
    # serial type 6 declares an 8-byte big-endian int; a body torn
    # mid-integer must raise (row drop), not silently decode the
    # short slice as a SMALLER value (int.from_bytes accepts any
    # length) — the torn-head hazard the text/blob branch already
    # guarded against
    full = bytes([2, 6]) + (1 << 40).to_bytes(8, "big")
    assert SQ._parse_record(full, "utf-8") == [1 << 40]
    torn = bytes([2, 6]) + (1 << 40).to_bytes(8, "big")[:4]
    with pytest.raises(ValueError, match="integer body"):
        SQ._parse_record(torn, "utf-8")


def test_differential_random_vs_sqlite3(tmp_path):
    """Seeded random rows: our walk must equal SELECT * exactly."""
    rng = random.Random(42)
    rows = []
    for _ in range(500):
        rows.append((
            rng.randint(-(1 << 62), 1 << 62),
            rng.random() * 1e12 - 5e11,
            "".join(chr(rng.randint(32, 0x2FA0))
                    for _ in range(rng.randint(0, 80))),
            bytes(rng.randrange(256)
                  for _ in range(rng.randint(0, 60))),
        ))

    def setup(con):
        con.execute("CREATE TABLE r (i INTEGER, f REAL, s TEXT, "
                    "b BLOB)")
        con.executemany("INSERT INTO r VALUES (?,?,?,?)", rows)
    p = tmp_path / "r.db"
    con = sqlite3.connect(p)
    setup(con)
    con.commit()
    want = con.execute("SELECT i, f, s, b FROM r").fetchall()
    con.close()
    got = [(r["i"], r["f"], r["s"], r["b"])
           for r in _rows(p.read_bytes(), "r")]
    assert got == want


@pytest.mark.parametrize("page_size", [512, 1024, 4096])
def test_overflow_chains_at_boundaries(tmp_path, page_size):
    """Payload sizes straddling the local-payload threshold X=U-35
    on several page geometries — the overflow formula on the hash
    path byte-for-byte."""
    u = page_size  # sqlite3 writes 0 reserved bytes
    sizes = [u - 40, u - 35, u - 34, u, 3 * u + 17, 10 * u]

    def setup(con):
        con.execute(f"PRAGMA page_size={page_size}")
        con.execute("CREATE TABLE o (n INTEGER, s TEXT)")
        for i, n in enumerate(sizes):
            con.execute("INSERT INTO o VALUES (?,?)",
                        (i, chr(65 + i) * n))
    data = _db_bytes(tmp_path, setup, f"o{page_size}.db")
    got = _rows(data, "o")
    assert [(r["n"], len(r["s"]), r["s"][:1], len(set(r["s"])))
            for r in got] \
        == [(i, n, chr(65 + i), 1) for i, n in enumerate(sizes)]


def test_interior_pages_many_rows(tmp_path):
    def setup(con):
        con.execute("PRAGMA page_size=512")
        con.execute("CREATE TABLE m (k INTEGER, v TEXT)")
        con.executemany("INSERT INTO m VALUES (?,?)",
                        [(i, f"row-{i}") for i in range(5000)])
    data = _db_bytes(tmp_path, setup)
    got = sorted(_rows(data, "m"), key=lambda r: r["k"])
    assert len(got) == 5000
    assert got[4321] == {"k": 4321, "v": "row-4321"}


def test_integer_primary_key_rowid_alias(tmp_path):
    """IPK stores NULL in the record; the value is the rowid —
    including negative and 9-byte-varint rowids."""
    def setup(con):
        con.execute("CREATE TABLE a (id INTEGER PRIMARY KEY, "
                    "v TEXT)")
        con.execute("INSERT INTO a VALUES (-1, 'neg')")
        con.execute("INSERT INTO a VALUES (7, 'seven')")
        con.execute("INSERT INTO a VALUES (?, 'big')", (1 << 62,))
    data = _db_bytes(tmp_path, setup)
    got = sorted(_rows(data, "a"), key=lambda r: r["id"])
    assert got == [{"id": -1, "v": "neg"},
                   {"id": 7, "v": "seven"},
                   {"id": 1 << 62, "v": "big"}]


def test_table_level_pk_and_desc_disqualifier():
    cols, ipk, wr = parse_create_table(
        'CREATE TABLE t ("id" INTEGER, v TEXT, PRIMARY KEY("id"))')
    assert (cols, ipk, wr) == (["id", "v"], 0, False)
    cols, ipk, wr = parse_create_table(
        "CREATE TABLE t (id INTEGER PRIMARY KEY DESC, v TEXT)")
    assert ipk is None
    cols, ipk, wr = parse_create_table(
        "CREATE TABLE t (id INT PRIMARY KEY, v TEXT)")
    assert ipk is None  # INT is not INTEGER: no alias, per spec
    cols, ipk, wr = parse_create_table(
        "CREATE TABLE t (a TEXT, b INTEGER PRIMARY KEY, "
        "c BLOB, PRIMARY KEY(a, c))")  # not legal SQL but parseable
    assert cols == ["a", "b", "c"] and ipk == 1
    cols, ipk, wr = parse_create_table(
        "CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) "
        "WITHOUT ROWID")
    assert wr is True and ipk is None


def test_quoted_and_weird_column_names(tmp_path):
    def setup(con):
        con.execute('CREATE TABLE q ("select" TEXT, [two words] '
                    "INTEGER, `tick` REAL, \"do\"\"uble\" TEXT)")
        con.execute("INSERT INTO q VALUES ('a', 2, 3.0, 'd')")
    data = _db_bytes(tmp_path, setup)
    assert _rows(data, "q") == [
        {"select": "a", "two words": 2, "tick": 3.0,
         'do"uble': "d"}]


def test_alter_table_add_column_nulls_tail(tmp_path):
    def setup(con):
        con.execute("CREATE TABLE g (a INTEGER)")
        con.execute("INSERT INTO g VALUES (1)")
        con.execute("ALTER TABLE g ADD COLUMN b TEXT")
        con.execute("INSERT INTO g VALUES (2, 'new')")
    data = _db_bytes(tmp_path, setup)
    got = sorted(_rows(data, "g"), key=lambda r: r["a"])
    assert got == [{"a": 1, "b": None}, {"a": 2, "b": "new"}]


@pytest.mark.parametrize("enc", ["UTF-16", "UTF-16le", "UTF-16be"])
def test_utf16_encodings(tmp_path, enc):
    def setup(con):
        con.execute(f"PRAGMA encoding='{enc}'")
        con.execute("CREATE TABLE e (s TEXT)")
        con.execute("INSERT INTO e VALUES ('grüß 漢字')")
    data = _db_bytes(tmp_path, setup, f"e-{enc}.db")
    assert _rows(data, "e") == [{"s": "grüß 漢字"}]


def test_without_rowid_tables_drop_not_misread(tmp_path):
    def setup(con):
        con.execute("CREATE TABLE w (k TEXT PRIMARY KEY, v INTEGER) "
                    "WITHOUT ROWID")
        con.execute("INSERT INTO w VALUES ('x', 1)")
        con.execute("CREATE TABLE ok (k INTEGER)")
        con.execute("INSERT INTO ok VALUES (5)")
    data = _db_bytes(tmp_path, setup)
    assert _rows(data, "w") == []           # table drop, never wrong
    assert _rows(data, "ok") == [{"k": 5}]  # neighbours unaffected
    assert list_tables(data) == ["ok"]


def test_indexes_views_triggers_invisible(tmp_path):
    def setup(con):
        con.execute("CREATE TABLE t (k INTEGER, v TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(i, f"v{i}") for i in range(200)])
        con.execute("CREATE INDEX ix ON t(v)")
        con.execute("CREATE VIEW vw AS SELECT k FROM t")
        con.execute("CREATE TRIGGER tr AFTER INSERT ON t BEGIN "
                    "SELECT 1; END")
    data = _db_bytes(tmp_path, setup)
    assert len(_rows(data, "t")) == 200
    assert _rows(data, "ix") == [] and _rows(data, "vw") == []
    assert list_tables(data) == ["t"]


def test_junk_and_torn_files(tmp_path):
    assert _rows(b"this is not sqlite at all" * 40, "t") == []
    assert list_tables(b"") == []

    def setup(con):
        con.execute("PRAGMA page_size=512")
        con.execute("CREATE TABLE t (k INTEGER, s TEXT)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(i, "x" * 200) for i in range(2000)])
    data = _db_bytes(tmp_path, setup)
    torn = data[:len(data) // 2]
    got = _rows(torn, "t")  # truncated forest: complete rows only
    full = {r["k"] for r in _rows(data, "t")}
    assert {r["k"] for r in got} <= full
    assert all(r["s"] == "x" * 200 for r in got)


def test_payload_bomb_bound(tmp_path, monkeypatch):
    def setup(con):
        con.execute("CREATE TABLE t (s TEXT)")
        con.execute("INSERT INTO t VALUES (?)", ("y" * 100_000,))
        con.execute("INSERT INTO t VALUES ('small')")
    data = _db_bytes(tmp_path, setup)
    monkeypatch.setattr(SQ, "MAX_PAYLOAD_BYTES", 1024)
    assert _rows(data, "t") == [{"s": "small"}]  # row drop only


def test_empty_table_and_missing_table(tmp_path):
    def setup(con):
        con.execute("CREATE TABLE empty (a INTEGER)")
    data = _db_bytes(tmp_path, setup)
    assert _rows(data, "empty") == []
    assert _rows(data, "absent") == []


def test_spark_read_with_ddl_adapters(tmp_path, spark):
    def setup(con):
        con.execute("CREATE TABLE ev (note TEXT, event_id INTEGER "
                    "PRIMARY KEY, user_id INTEGER, event_type TEXT, "
                    "value REAL, flag INTEGER)")
        con.executemany(
            "INSERT INTO ev VALUES (?,?,?,?,?,?)",
            [("n" * 900, i, 100 + i, f"k{i % 3}",
              None if i % 5 == 0 else i * 1.5, i % 2)
             for i in range(50)])
    _db_bytes(tmp_path, setup, "part-0.sqlite")

    def setup2(con):
        con.execute("CREATE TABLE other (x INTEGER)")
    _db_bytes(tmp_path, setup2, "part-1.sqlite")  # table absent
    (tmp_path / "junk.sqlite").write_bytes(b"no magic here")

    df = read_sqlite(
        spark, str(tmp_path), "ev",
        "event_id bigint, user_id bigint, event_type string, "
        "value double, flag boolean")
    got = sorted((r.event_id, r.user_id, r.event_type, r.value,
                  r.flag) for r in df.collect())
    assert got == [
        (i, 100 + i, f"k{i % 3}",
         None if i % 5 == 0 else i * 1.5, bool(i % 2))
        for i in range(50)]


def test_cli_sqlite_scan(spark, tmp_path, capsys):
    from distributed_computing_projects_spark.cli import main

    con = sqlite3.connect(tmp_path / "c.sqlite")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, "
                "name TEXT)")
    con.execute("INSERT INTO t VALUES (2, 'n2')")
    con.commit()
    con.close()
    rc = main(["sqlite-scan", str(tmp_path), "--table", "t",
               "--ddl", "id bigint, name string"], spark=spark)
    assert rc == 0
    assert "n2" in capsys.readouterr().out
