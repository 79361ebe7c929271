"""Cross-engine parity of the 31-polynomial rolling hash — the
primitive under fingerprinting (q49), MinHash (q43), SimHash (q44) and
the LSH pipelines. Random ASCII strings, one batch through each engine,
exact equality."""

from __future__ import annotations

import random
import string

import duckdb

from parquet_demo_spark.functions import poly_hash, poly_hash_sql


def test_poly_hash_matches_duckdb_on_random_strings(spark):
    rng = random.Random(42)
    alphabet = string.ascii_lowercase + string.ascii_uppercase + string.digits + " _-"
    samples = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80)))
        for _ in range(300)
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r.s: r.h for r in sdf.select("s", poly_hash("s").alias("h")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    want = dict(con.execute(f"SELECT s, {poly_hash_sql('s')} FROM t").fetchall())

    assert got == want
