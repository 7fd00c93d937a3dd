"""Live-Postgres bulk load/read through the COPY protocol, driven by the
``psql`` CLI — no driver jar or Python DB-API module required.

The reference's actual sink is Postgres 15 (`/root/reference/etl.py:704-719`:
SQLAlchemy ``to_sql(..., if_exists='replace')``). The repo's JDBC path
(io/jdbc.py) carries the same DDL contract and is round-trip-certified
against embedded Derby; this module closes the environment gap with a REAL
PostgreSQL server. It deliberately uses COPY, not row INSERTs: COPY is
Postgres's bulk-ingest fast path, and at a 100 TB scale the right shape is
exactly what this module produces — Spark writes N CSV part files in
parallel, then each part streams through its own COPY (here sequentially
through one psql process; on a cluster, one COPY connection per part —
COPY throughput scales with connections until the server's WAL/IO bound).

Fidelity contract (asserted by tests/test_postgres_e2e.py):
- DDL comes from io/jdbc.postgres_ddl — the SAME type mapping the JDBC
  overwrite path would issue, so certifying COPY certifies the DDL too.
- NULL travels as unquoted ``\\N`` (both directions); empty string stays
  a quoted empty field — the NULL/'' distinction survives the trip.
- Timestamps are written with an explicit microsecond pattern and read
  back through ``to_char(.., 'YYYY-MM-DD HH24:MI:SS.US')``, booleans
  through CASE to 'true'/'false', so both directions parse exactly with
  a pinned schema — no inference, no silent PERMISSIVE-mode nulls.

Caveat (documented, not load-bearing for the fixtures): a VALUE equal to
the literal two-character string ``\\N`` would be written unquoted by
Spark's CSV writer and read back as NULL.
"""

from __future__ import annotations

import glob
import os
import subprocess
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from assignment_etl_spark.io.jdbc import postgres_ddl


def _check_ident(name: str) -> str:
    """Reject identifiers the double-quote wrapping below cannot make
    safe. Table/column names are interpolated into SQL wrapped in
    ``"..."``; a name containing a double quote (or a NUL, which psql
    truncates at) would break out of the quoting — fail loudly instead
    of emitting injectable SQL (ADVICE r5)."""
    if not name or '"' in name or "\x00" in name:
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


_TS_WRITE = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_CSV_OPTS = {
    "header": "false",
    "nullValue": "\\N",
    "emptyValue": '""',
    "quote": '"',
    "escape": '"',  # RFC 4180 doubling, which Postgres CSV mode expects
    "timestampFormat": _TS_WRITE,
    "timestampNTZFormat": _TS_WRITE,
}
# read side: emptyValue must stay the default (Spark maps a QUOTED empty
# field to '' and an unquoted empty to NULL, which is exactly the
# FORCE_QUOTE * contract below); setting '""' here would inject a literal
# two-character string instead
_CSV_READ_OPTS = {
    k: v for k, v in _CSV_OPTS.items() if k != "emptyValue"
}


@dataclass
class PsqlConn:
    """Connection parameters for the psql CLI. ``host`` may be a unix
    socket directory (the test harness default) or a hostname."""

    host: str
    db: str
    user: str
    port: int = 5432
    psql: str = "psql"

    def cmd(self) -> list[str]:
        return [
            self.psql,
            "-h", self.host,
            "-p", str(self.port),
            "-U", self.user,
            "-d", self.db,
            "-v", "ON_ERROR_STOP=1",
            "-q", "-X",
        ]

    def run(self, *sql: str, input_text: str | None = None) -> str:
        cmd = self.cmd()
        for s in sql:
            cmd += ["-c", s]
        out = subprocess.run(
            cmd,
            input=input_text,
            capture_output=True,
            text=True,
            check=False,
        )
        if out.returncode != 0:
            raise RuntimeError(f"psql failed: {out.stderr.strip()}")
        return out.stdout


def postgres_copy_load(
    df: DataFrame,
    table: str,
    conn: PsqlConn,
    *,
    mode: str = "replace",
    csv_parts: int | None = None,
) -> int:
    """Bulk-load ``df`` into Postgres table ``table`` via CSV + COPY;
    returns the number of part files loaded. ``mode='replace'`` mirrors
    the reference's ``to_sql(if_exists='replace')`` (drop + recreate
    with the postgres_ddl types); ``'append'`` assumes the table
    exists."""
    if mode not in ("replace", "append"):
        raise ValueError(f"mode must be replace|append, got {mode!r}")
    _check_ident(table)
    with tempfile.TemporaryDirectory(prefix="pg_copy_") as d:
        out_dir = os.path.join(d, "csv")
        writer = df.write
        if csv_parts:
            writer = df.coalesce(csv_parts).write
        writer.options(**_CSV_OPTS).csv(out_dir)
        parts = sorted(glob.glob(os.path.join(out_dir, "part-*.csv")))
        ddl: list[str] = []
        if mode == "replace":
            ddl = [f'DROP TABLE IF EXISTS "{table}"', postgres_ddl(df, table)]
        # \copy runs client-side so the server never needs filesystem
        # access to our temp dir; each part is its own statement — the
        # unit a parallel loader would fan out per connection
        copies = [
            f"\\copy \"{table}\" FROM '{p}' WITH (FORMAT csv, NULL '\\N')"
            for p in parts
        ]
        conn.run(*ddl, *copies)
        return len(parts)


def _select_expr(f: T.StructField) -> str:
    q = f'"{_check_ident(f.name)}"'
    if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
        return f"to_char({q}, 'YYYY-MM-DD HH24:MI:SS.US') AS {q}"
    if isinstance(f.dataType, T.BooleanType):
        return f"CASE WHEN {q} THEN 'true' WHEN NOT {q} THEN 'false' END AS {q}"
    return q


def postgres_read_table(
    spark: SparkSession,
    table: str,
    conn: PsqlConn,
    schema: T.StructType,
) -> DataFrame:
    """Read a Postgres table back as a DataFrame with the given schema
    via ``COPY TO STDOUT`` — the symmetric bulk-export path. The dump
    STREAMS from psql's stdout straight into a temp file (never
    buffered in this process — a table bigger than driver memory dumps
    fine; ADVICE r5) and is parsed by Spark's CSV reader with the
    pinned schema (FAILFAST: a formatting drift fails loudly rather
    than nulling values)."""
    _check_ident(table)
    select = ", ".join(_select_expr(f) for f in schema.fields)
    # FORCE_QUOTE *: Postgres otherwise emits the empty string as an
    # UNQUOTED empty field, which Spark's reader maps to NULL — quoting
    # every non-NULL value keeps the NULL vs '' distinction intact
    sql = (
        f'COPY (SELECT {select} FROM "{table}") TO STDOUT '
        "WITH (FORMAT csv, NULL '\\N', FORCE_QUOTE *)"
    )
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix=".csv", delete=False, prefix="pg_dump_"
    )
    try:
        out = subprocess.run(
            conn.cmd() + ["-c", sql],
            stdout=tmp,
            stderr=subprocess.PIPE,
            text=True,
            check=False,
        )
        tmp.close()
        if out.returncode != 0:
            raise RuntimeError(f"psql failed: {out.stderr.strip()}")
        return (
            spark.read.options(**_CSV_READ_OPTS)
            # values may carry embedded newlines inside quotes; multiLine
            # costs file-at-a-time parsing, fine for a COPY dump file
            .option("multiLine", "true")
            .option("mode", "FAILFAST")
            .schema(schema)
            .csv(tmp.name)
            .localCheckpoint(eager=True)  # sever from the temp file
        )
    finally:
        try:
            os.unlink(tmp.name)
        except OSError:
            pass
