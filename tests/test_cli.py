"""EDFS shell end-to-end: the full Terminal.js command grammar driven
through one session against a scratch warehouse (mkdir → put → ls → cat →
getPartitionLocations → readPartition → aggregates → rm)."""

import csv
import io
import os
import tempfile

import pytest

from dsci551_edfs_spark.cli import EdfsShell
from dsci551_edfs_spark.sources.registry import load_table

SCRATCH = "/root/repo/.scratch/test_cli"


@pytest.fixture(scope="module")
def shell(spark):
    os.makedirs(SCRATCH, exist_ok=True)
    return EdfsShell(spark, tempfile.mkdtemp(prefix="wh_", dir=SCRATCH))


@pytest.fixture(scope="module")
def nation_csv(spark, sf_dir):
    path = os.path.join(SCRATCH, "nation.csv")
    load_table(spark, sf_dir, "nation").toPandas().to_csv(path, index=False)
    return path


def test_full_session(shell, nation_csv):
    assert shell.execute("mkdir /data")["status"] == "EDFS200"
    out = shell.execute(f"put {nation_csv} /data/nation.csv 4 n_regionkey")
    assert out["status"] == "EDFS200"

    ls = shell.execute("ls /data")
    assert ls["status"] == "EDFS200"
    assert "nation.csv" in ls["response"]

    cat = shell.execute("cat /data/nation.csv")
    rows = list(csv.DictReader(io.StringIO(cat["response"])))
    assert len(rows) == 25
    # row order restored via the injected index column; index not exposed
    assert rows[0]["n_name"] is not None and "index" not in rows[0]

    locs = shell.execute("getPartitionLocations /data/nation.csv")
    assert locs["status"] == "EDFS200" and len(locs["response"]) >= 1

    part1 = shell.execute("readPartition /data/nation.csv 1")
    n_part1 = len(list(csv.DictReader(io.StringIO(part1["response"]))))
    assert 0 < n_part1 < 25

    avg = shell.execute("getAvg /data/nation.csv n_regionkey")
    assert avg["status"] == "EDFS200"
    assert avg["response"]["result"] == "The overall average is 2.000"

    mx = shell.execute("getMax /data/nation.csv n_regionkey true")
    assert mx["response"]["result"] == "The overall maximum is 4.000"
    assert len(mx["response"]["partitions"]) >= 1  # debug channel

    pruned = shell.execute("getAvg /data/nation.csv n_nationkey false 0")
    assert pruned["status"] == "EDFS200"  # hash partition pruning path

    assert shell.execute("rm /data/nation.csv")["status"] == "EDFS200"
    assert shell.execute("cat /data/nation.csv")["status"] == "EDFS400"


def test_errors(shell):
    assert shell.execute("cat /nope")["status"] == "EDFS400"
    assert shell.execute("frobnicate x")["status"] == "EDFS400"
    assert shell.execute("getAvg /nope")["status"] == "EDFS400"
    assert shell.execute("")["status"] == "EDFS200"


def test_hardcoded_column_aliases(shell):
    """Reference surface parity: getAvgFamilyIncome / firebase_getAvgGripStrn
    bind their NHANES column server-side (fs_commands.py:396-460,
    proj-firebase-flask.py:637-703)."""
    path = os.path.join(SCRATCH, "nhanes.csv")
    with open(path, "w") as f:
        f.write("SEQN,INDFMIN2,DMDYRSUS,MGDCGSZ,BMXARMC\n")
        for i in range(10):
            f.write(f"{i},{10 + i},{i % 5},{30 + i},{25 + i}\n")
    assert shell.execute("mkdir /nhanes")["status"] == "EDFS200"
    assert shell.execute(f"put {path} /nhanes/demo.csv 2 SEQN")["status"] == "EDFS200"

    out = shell.execute("getAvgFamilyIncome /nhanes/demo.csv")
    assert out["response"]["result"] == "The overall average is 14.500"
    out = shell.execute("getAvgTimeInUS /nhanes/demo.csv")
    assert out["response"]["result"] == "The overall average is 2.000"
    out = shell.execute("firebase_getAvgGripStrn /nhanes/demo.csv true")
    assert out["response"]["result"] == "The overall average is 34.500"
    assert len(out["response"]["partitions"]) >= 1  # debug channel works
    out = shell.execute("firebase_getAvgArmCircum /nhanes/demo.csv")
    assert out["response"]["result"] == "The overall average is 29.500"


def test_clear_and_repl_loop(shell):
    """`clear` completes the 11-command Terminal.js grammar: execute()
    returns an action envelope, and the REPL acts on it terminal-side
    (ANSI clear) instead of printing JSON — then exits cleanly on both
    'exit' and EOF."""
    from dsci551_edfs_spark.cli import CLEAR_SEQ, repl

    out = shell.execute("clear")
    assert out["status"] == "EDFS200"
    assert out["response"] == {"action": "clear"}

    lines = iter(["ls /", "clear", "exit"])
    writes = []
    assert repl(shell, input_fn=lambda _: next(lines), write=writes.append) == 0
    assert len(writes) == 2  # ls envelope + clear sequence, no post-exit writes
    assert "Found" in writes[0] or "EDFS" in writes[0]
    assert writes[1] == CLEAR_SEQ

    # EOF (ctrl-d) ends the loop without error
    def eof(_):
        raise EOFError

    assert repl(shell, input_fn=eof, write=writes.append) == 0


def test_cat_emit_is_streamed_and_capped(shell, nation_csv, monkeypatch):
    """The CSV emit path must not driver-materialize the table: rows
    stream through toLocalIterator (toPandas would collect everything),
    and the row cap truncates with an explicit marker."""
    import dsci551_edfs_spark.cli as CLI

    shell.execute("mkdir /cap")
    assert shell.execute(f"put {nation_csv} /cap/nation.csv 4 n_regionkey")[
        "status"
    ] == "EDFS200"

    # structural: the emit path never calls DataFrame.toPandas
    def _boom(self, *a, **k):
        raise AssertionError("emit path must not driver-materialize via toPandas")

    from pyspark.sql import DataFrame

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    full = shell.execute("cat /cap/nation.csv")
    assert full["status"] == "EDFS200"
    assert len(list(csv.DictReader(io.StringIO(full["response"])))) == 25

    # capped: 10-row limit on a 25-row table → 10 rows + truncation marker
    monkeypatch.setattr(CLI.EdfsShell, "max_csv_rows", 10)
    capped = shell.execute("cat /cap/nation.csv")
    body = capped["response"]
    assert "# truncated at 10 rows" in body
    data_lines = [
        l for l in body.strip().splitlines()[1:] if not l.startswith("#")
    ]
    assert len(data_lines) == 10
    part = shell.execute("readPartition /cap/nation.csv 1")
    assert part["status"] == "EDFS200"
    shell.execute("rm /cap/nation.csv")


def test_cli_query_dispatch(shell):
    """`query <name>` runs any registered catalog query (bounded emit);
    `queries` lists the registry with rows-only markers."""
    out = shell.execute("query pmr_avg /root/testdata/sf0.001")
    assert out["status"] == "EDFS200"
    assert "avg_qty" in out["response"]
    listing = shell.execute("queries")
    assert listing["status"] == "EDFS200"
    assert "pmr_avg" in listing["response"]
    # a genuinely non-SQL query carries the marker; an oracle-backed one
    # must NOT (ann_ivf_topk gained its full oracle in round 8,
    # bpe_train_merges in round 9)
    assert "embedding_pca_project  (rows-only)" in listing["response"]
    assert "ann_ivf_topk  (rows-only)" not in listing["response"]
    assert "bpe_train_merges  (rows-only)" not in listing["response"]
    bad = shell.execute("query no_such_thing")
    assert bad["status"] != "EDFS200"
