"""Namespace operations: `mkdir`, `ls`, `rm` over a warehouse directory.

The reference emulates an HDFS namenode twice (MySQL inode/edge tables,
`init.sql:5-16`; Firebase JSON tree, `combined_flask.py:44-47`). A Spark
engine needs neither: the namespace IS the filesystem (Hadoop `FileSystem`
API → works for file://, hdfs://, s3a:// alike). We keep the reference's
observable semantics:

- `mkdir -p` behavior (the MySQL variant creates missing intermediate dirs,
  `combined_flask.py:108-131` — SURVEY.md §2 picks this semantic).
- `rm` refuses the root and non-empty directories
  (`combined_flask.py:222-226`, `:244-250`); deleting a table removes its
  whole parquet directory (the reference's 9-table cascade,
  `combined_flask.py:251-260`, collapses into one recursive delete of the
  table dir — a *table* is one path here).
- `ls` returns HDFS-style rows: permissions, size, mtime, name with a
  `Found N items` header (`combined_flask.py:140-212`).

Implemented with the JVM Hadoop FileSystem through the SparkContext so the
same code runs against any Hadoop-compatible store, not just local disk.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession

__all__ = ["EdfsCatalog"]


class EdfsCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        self._hadoop_conf = jsc.hadoopConfiguration()
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.warehouse).getFileSystem(self._hadoop_conf)
        self._fs.mkdirs(self._Path(self.warehouse))

    def _resolve(self, path: str):
        path = "/" + path.strip("/")
        return self._Path(self.warehouse + path), path

    def exists(self, path: str) -> bool:
        p, _ = self._resolve(path)
        return bool(self._fs.exists(p))

    def mkdir(self, path: str) -> dict:
        """`mkdir -p`: creates missing intermediates (MySQL semantic,
        `combined_flask.py:108-131`)."""
        p, norm = self._resolve(path)
        if self._fs.exists(p):
            raise FileExistsError(f"mkdir: {norm}: already exists")
        self._fs.mkdirs(p)
        return {"created": norm}

    def ls(self, path: str = "/") -> list[dict]:
        """HDFS-style listing (`combined_flask.py:140-212`)."""
        p, norm = self._resolve(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(f"ls: {norm}: no such file or directory")
        statuses = self._fs.listStatus(p)
        out = []
        for st in statuses:
            is_dir = st.isDirectory()
            perm = ("d" if is_dir else "-") + str(st.getPermission())
            size = 0 if is_dir else st.getLen()
            if is_dir:
                # directory size = sum of contained file lengths, like the
                # reference's block-size sum (`combined_flask.py:977-980`)
                size = self._fs.getContentSummary(st.getPath()).getLength()
            out.append(
                {
                    "permissions": perm,
                    "size": int(size),
                    "mtime": datetime.fromtimestamp(
                        st.getModificationTime() / 1000
                    ).strftime("%Y-%m-%d %H:%M"),
                    "name": st.getPath().getName(),
                    "type": "dir" if is_dir else "file",
                }
            )
        return sorted(out, key=lambda r: r["name"])

    def format_ls(self, path: str = "/") -> str:
        rows = self.ls(path)
        lines = [f"Found {len(rows)} items"]
        for r in rows:
            lines.append(
                f"{r['permissions']:<12}{r['size']:>12} {r['mtime']} {r['name']}"
            )
        return "\n".join(lines)

    def _is_table_dir(self, p) -> bool:
        """A parquet table dir (contains _SUCCESS / *.parquet / partition
        subdirs) is treated as a file-like leaf, mirroring 'file = table'."""
        for st in self._fs.listStatus(p):
            name = st.getPath().getName()
            if name == "_SUCCESS" or name.endswith(".parquet") or "=" in name:
                return True
        return False

    def rm(self, path: str) -> dict:
        """Delete a table (recursively) or an EMPTY plain directory; refuse
        the root and non-empty non-table dirs (`combined_flask.py:222-260`)."""
        p, norm = self._resolve(path)
        if norm == "/":
            raise PermissionError("rm: cannot remove root directory")
        if not self._fs.exists(p):
            raise FileNotFoundError(f"rm: {norm}: no such file or directory")
        if self._fs.getFileStatus(p).isDirectory():
            children = self._fs.listStatus(p)
            if len(children) > 0 and not self._is_table_dir(p):
                raise OSError(f"rm: {norm}: directory is not empty")
        self._fs.delete(p, True)
        return {"removed": norm}

    def table_path(self, path: str) -> str:
        _, norm = self._resolve(path)
        return self.warehouse + norm
